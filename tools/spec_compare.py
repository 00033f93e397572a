#!/usr/bin/env python3
"""Single-lever attribution table: compare two specificity runs' milestone
evals (docs/SPEC_BAR.md protocol).

    python tools/spec_compare.py docs/specificity7 docs/specificity5 \
        [--labels v7(sync+cap) ctrl(cap-only)] [--steps 25000 ...]

Reads evalN_<step>.json from each dir, prints a markdown table of the
pre-registered metrics per matched step, and — because both runs are
evaluated with the same seed/spread on the same manifest — a PAIRED
per-clip delta (mean +/- t) of the primary bar metric between the runs at
each matched step.  Pairing uses each row's `_manifest_index` when
present, else position.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def load_runs(d: Path):
    out = {}
    for p in sorted(d.glob("evalN_*.json")):
        try:
            step = int(p.stem.split("_")[1])
        except ValueError:
            continue
        out[step] = json.load(open(p))
    return out


def fmt(v, pct=False):
    if v is None:
        return "—"
    return f"{v:.2f}" if pct else f"{v:+.3f}"


def paired_delta(rows_a, rows_b, pos_key, neg_key):
    """Per-clip (gap_a - gap_b) mean and t, paired by manifest index."""
    def gaps(rows):
        out = {}
        for i, r in enumerate(rows):
            if pos_key not in r or neg_key not in r:
                return {}
            out[r.get("_manifest_index", i)] = r[pos_key] - r[neg_key]
        return out

    ga, gb = gaps(rows_a), gaps(rows_b)
    keys = sorted(set(ga) & set(gb))
    if len(keys) < 3:
        return None, None, 0
    d = np.array([ga[k] - gb[k] for k in keys])
    t = d.mean() / (d.std(ddof=1) / np.sqrt(len(d)) + 1e-12)
    return float(d.mean()), float(t), len(d)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a", type=Path)
    ap.add_argument("dir_b", type=Path)
    ap.add_argument("--labels", nargs=2, default=None)
    ap.add_argument("--steps", type=int, nargs="+", default=None)
    args = ap.parse_args(argv)
    la, lb = args.labels or (args.dir_a.name, args.dir_b.name)
    runs_a, runs_b = load_runs(args.dir_a), load_runs(args.dir_b)
    steps = args.steps or sorted(set(runs_a) & set(runs_b))
    if not steps:
        print(f"no matched evalN steps between {args.dir_a} and {args.dir_b}")
        print(f"  {la}: {sorted(runs_a)}\n  {lb}: {sorted(runs_b)}")
        return 1

    cols = ["gap_mouth0_gen", "gap_mouth0_gen_t", "gap_mouth0_real",
            "gap_logmel", "gap_logmel_t", "gap_env",
            "retrieval_top1", "env_retrieval_top1"]
    print("| step | run | " + " | ".join(cols) + " | bar |")
    print("|" + "---|" * (len(cols) + 3))
    for s in steps:
        for lbl, run in ((la, runs_a.get(s)), (lb, runs_b.get(s))):
            if run is None:
                continue
            m = run["mean"]
            bar = "—"
            if m.get("gap_mouth0_gen") is not None \
                    and m.get("gap_mouth0_real") is not None:
                ok = (m["gap_mouth0_gen"] >= m["gap_mouth0_real"]
                      and (m.get("gap_mouth0_gen_t") or 0) >= 2.0)
                bar = "PASS" if ok else "fail"
            cells = [fmt(m.get(c), pct=c.endswith("top1")) for c in cols]
            print(f"| {s} | {lbl} | " + " | ".join(cells) + f" | {bar} |")

    print("\nPaired per-clip deltas (A - B), mouth-crop zero-lag gap:")
    for s in steps:
        if s not in runs_a or s not in runs_b:
            continue
        d, t, n = paired_delta(
            runs_a[s]["per_clip"], runs_b[s]["per_clip"],
            "av_sync_corr_mouth0_gen", "av_sync_corr_mouth0_shuf")
        if d is None:
            print(f"  step {s}: rows not pairable")
        else:
            print(f"  step {s}: {la} - {lb} = {d:+.4f} (t={t:+.2f}, n={n})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
