#!/usr/bin/env python3
"""Per-speaker breakdown of a specificity eval JSON.

    python tools/spec_breakdown.py runs/specificity5/evalN_100000.json \
        [--manifest data/GRID/clips_4spk_val.json] [--keys gap_env gap_logmel]

Why: the v4 campaign showed both the model's specificity AND the sync
instruments' own ceilings are strongly speaker-dependent (s4's real-audio
mouth zero-lag anchor gap is ~0 while s3's is +0.151 — PERFORMANCE.md
"Specificity v4").  Pooled means hide that; this tool splits every paired
gap by speaker using the `_manifest_index` each per-clip row carries.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

PAIRS = {
    # paired positive/negative keys -> display name
    "gap_logmel": ("logmel_l1_shuf", "logmel_l1"),
    "gap_env": ("env_corr_gen", "env_corr_shuf"),
    "gap0_gen": ("av_sync_corr0_gen", "av_sync_corr0_shuf"),
    "gap_mouth0_gen": ("av_sync_corr_mouth0_gen", "av_sync_corr_mouth0_shuf"),
    "gap_mouth_gen": ("av_sync_corr_mouth_gen", "av_sync_corr_mouth_shuf"),
    "gap_mouth_real": ("av_sync_corr_mouth_real",
                       "av_sync_corr_mouth_real_shuf"),
    "gap_env_floor": ("env_corr_gen", "env_corr_real_shuf"),
}


def speaker_of(manifest_clips, idx: int) -> str:
    d = manifest_clips[idx]["video_frames_dir"]
    part = Path(d).parts[2] if len(Path(d).parts) > 2 else d
    # layout: frames_val == s1's held-out split (prep_grid_all.sh)
    return {"frames_val": "s1", "frames": "s1"}.get(
        part, part.replace("frames_", ""))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_json", type=Path)
    ap.add_argument("--manifest", type=Path,
                    default=Path("data/GRID/clips_4spk_val.json"))
    ap.add_argument("--keys", nargs="+", default=None,
                    help="paired-gap keys to break down (default: all "
                         "present)")
    args = ap.parse_args(argv)

    rows = json.loads(args.eval_json.read_text())["per_clip"]
    clips = json.loads(args.manifest.read_text())["clips"]
    if any("_manifest_index" not in r for r in rows):
        raise SystemExit("eval JSON has no _manifest_index per clip "
                         "(rerun tools/eval_av_quality.py)")
    keys = args.keys or [k for k, (p, n) in PAIRS.items()
                         if p in rows[0] and n in rows[0]]

    by_spk = {}
    for r in rows:
        by_spk.setdefault(speaker_of(clips, r["_manifest_index"]), []).append(r)

    def stat(rs, pos, neg):
        d = np.array([r[pos] - r[neg] for r in rs], np.float64)
        if len(d) < 2:
            return d.mean() if len(d) else float("nan"), float("nan"), len(d)
        t = d.mean() / (d.std(ddof=1) / np.sqrt(len(d)) + 1e-12)
        return float(d.mean()), float(t), len(d)

    hdr = f"{'speaker':>8} " + " ".join(f"{k:>22}" for k in keys)
    print(hdr)
    for spk in sorted(by_spk) + ["ALL"]:
        rs = rows if spk == "ALL" else by_spk[spk]
        cells = []
        for k in keys:
            pos, neg = PAIRS[k]
            m, t, n = stat(rs, pos, neg)
            cells.append(f"{m:+.3f} (t={t:+.1f}, n={n})")
        print(f"{spk:>8} " + " ".join(f"{c:>22}" for c in cells))


if __name__ == "__main__":
    main()
