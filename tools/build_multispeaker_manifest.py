#!/usr/bin/env python3
"""Build train/val manifests across multiple GRID speakers.

Round-3 specificity corpus: speakers s1-s4 (reference data facts: SURVEY
Appendix B — 4 x 1000 clips).  Frames live in per-speaker roots
(data/video/frames for s1, frames_s2.. for the rest, because GRID filenames
repeat across speakers) and wavs in data/audio/wav16k/<spk>/.

Split rule (matches round 2's s1 split): for each speaker, videos at sort
positions [val_start, val_start+val_count) are VAL and never trained on.

Usage:
  python tools/build_multispeaker_manifest.py \
      --out-train data/GRID/clips_4spk.json \
      --out-val data/GRID/clips_4spk_val.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# s1 was physically split in round 2 (frames/ = 968 train videos,
# frames_val/ = the 32 held-out ones); s2-s4 split by sort position.
SPEAKERS = {
    "s1": ("data/video/frames", "data/audio/wav16k/s1",
           "data/video/frames_val"),
    "s2": ("data/video/frames_s2", "data/audio/wav16k/s2", None),
    "s3": ("data/video/frames_s3", "data/audio/wav16k/s3", None),
    "s4": ("data/video/frames_s4", "data/audio/wav16k/s4", None),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-train", type=Path, required=True)
    ap.add_argument("--out-val", type=Path, required=True)
    ap.add_argument("--val-start", type=int, default=400,
                    help="0-based sort position where the val block starts "
                         "(round 2 used videos 401-432 1-based for s1)")
    ap.add_argument("--val-count", type=int, default=32)
    ap.add_argument("--speakers", nargs="+", default=list(SPEAKERS))
    ap.add_argument("--fps", type=int, default=16)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--clip-seconds", type=float, default=3.0)
    args = ap.parse_args(argv)

    train, val = [], []
    for spk in args.speakers:
        frames_root, wav_root, val_root = SPEAKERS[spk]
        wav_root = Path(wav_root)

        def emit(vdir: Path, bucket: list) -> bool:
            wav = REPO / wav_root / f"{vdir.name}.wav"
            if not wav.exists():
                return False
            inner = json.loads((vdir / "clips.json").read_text())
            for entry in inner["clips"]:
                bucket.append({
                    "video_frames_dir": entry["video_frames_dir"],
                    "audio_wav_path": str(wav.relative_to(REPO)),
                    "fps": args.fps,
                    "sr": args.sr,
                    "clip_seconds": args.clip_seconds,
                    "speaker": spk,
                })
            return True

        n_missing = 0
        vids = sorted(
            p.parent for p in (REPO / frames_root).rglob("clips.json"))
        if val_root is not None:  # physical split (s1)
            for vdir in vids:
                n_missing += not emit(vdir, train)
            for vdir in sorted(
                    p.parent for p in (REPO / val_root).rglob("clips.json")):
                n_missing += not emit(vdir, val)
        else:
            for i, vdir in enumerate(vids):
                is_val = args.val_start <= i < args.val_start + args.val_count
                n_missing += not emit(vdir, val if is_val else train)
        print(f"[{spk}] {len(vids)} videos, {n_missing} missing wavs")

    for out, clips in ((args.out_train, train), (args.out_val, val)):
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({"clips": clips}, indent=1))
        print(f"wrote {len(clips)} clips -> {out}")


if __name__ == "__main__":
    main(
)
