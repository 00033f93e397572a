#!/usr/bin/env python3
"""build_grid_manifest.py — join extracted frame clips with processed wavs
into the flat training manifest (parity with the reference
`tools/build_grid_manifest.py:9-49`).

Usage:
  python tools/build_grid_manifest.py --frames-root data/video/frames \
      --wav-root data/audio/wav16k --out data/GRID/clips.json \
      [--fps 16] [--sr 16000] [--clip-seconds 3.0]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def find_wav(wav_root: Path, stem: str):
    """Locate <stem>.wav anywhere under wav_root (speaker subdirs etc.)."""
    direct = wav_root / f"{stem}.wav"
    if direct.exists():
        return direct
    hits = list(wav_root.rglob(f"{stem}.wav"))
    return hits[0] if hits else None


def main(argv=None):
    ap = argparse.ArgumentParser(description="Build the flat AV training manifest.")
    ap.add_argument("--frames-root", type=Path, required=True,
                    help="Root of extract_frames.py output (per-video dirs)")
    ap.add_argument("--wav-root", type=Path, required=True)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--fps", type=int, default=16)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--clip-seconds", type=float, default=3.0)
    args = ap.parse_args(argv)

    clips = []
    missing = 0
    for manifest in sorted(args.frames_root.rglob("clips.json")):
        video_stem = manifest.parent.name
        wav = find_wav(args.wav_root, video_stem)
        if wav is None:
            missing += 1
            continue
        for entry in json.loads(manifest.read_text())["clips"]:
            clips.append(
                {
                    "video_frames_dir": entry["video_frames_dir"],
                    "audio_wav_path": str(wav),
                    "fps": args.fps,
                    "sr": args.sr,
                    "clip_seconds": args.clip_seconds,
                }
            )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps({"clips": clips}, indent=2))
    print(f"[done] {len(clips)} clips -> {args.out}"
          + (f" ({missing} videos missing audio)" if missing else ""))


if __name__ == "__main__":
    main()
