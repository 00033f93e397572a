#!/usr/bin/env python3
"""extract_frames.py — raw videos -> per-clip frame directories + manifest.

Capability parity with the reference `scripts/extract_frames.py:88-357`:
decode each video, fps-resample to the target rate, center-crop + resize each
frame, split into fixed-length clips (chunked frame ranges), write
`clips/clip_NNNN/frame_%06d.<ext>` and a per-video `clips.json` manifest.
Flag surface kept compatible (incl. the --fps/--size/--clip-seconds knobs).

Host-side offline tool (cv2); not on the TPU path.

Usage:
  python scripts/extract_frames.py --input data/video/raw --output data/video/frames \
      --fps 16 --size 128 128 --clip-seconds 3.0 [--ext jpg] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import List, Tuple

import numpy as np

VIDEO_EXTS = {".mpg", ".mpeg", ".mp4", ".avi", ".mov", ".mkv", ".webm"}


def center_resize_crop(img: np.ndarray, H: int, W: int) -> np.ndarray:
    """Resize the short side then center-crop to exactly (H, W)."""
    import cv2

    h, w = img.shape[:2]
    scale = max(H / h, W / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    y0 = (nh - H) // 2
    x0 = (nw - W) // 2
    return img[y0 : y0 + H, x0 : x0 + W]


def sample_indices(n_src: int, src_fps: float, tgt_fps: float) -> np.ndarray:
    """Source-frame indices that resample src_fps -> tgt_fps."""
    if src_fps <= 0:
        src_fps = tgt_fps
    duration = n_src / src_fps
    n_tgt = max(1, int(round(duration * tgt_fps)))
    idx = np.round(np.arange(n_tgt) * src_fps / tgt_fps).astype(np.int64)
    return np.clip(idx, 0, n_src - 1)


def chunk_ranges(n: int, clip_len: int, drop_last: bool = True,
                 hop: int = 0) -> List[Tuple[int, int]]:
    """Fixed-length clip windows; hop < clip_len gives overlapping clips
    (reference --hop-seconds semantics), hop == 0 means non-overlapping."""
    step = hop if hop > 0 else clip_len
    ranges = []
    a = 0
    while a < n:
        b = min(n, a + clip_len)
        if b - a < clip_len:
            if not drop_last:
                ranges.append((a, b))  # keep the short tail once
            break
        ranges.append((a, b))
        a += step
    return ranges


def parse_hw(size: str) -> Tuple[int, int]:
    """'128' -> (128, 128); '128x96' / '128X96' -> (128, 96)."""
    s = str(size).lower().replace("x", " ").split()
    if len(s) == 1:
        v = int(s[0])
        return v, v
    return int(s[0]), int(s[1])


def extract_for_video(
    video_path: Path,
    out_root: Path,
    fps: float,
    size_hw: Tuple[int, int],
    clip_seconds: float,
    ext: str = "jpg",
    hop_seconds: float = 0.0,
    quality: int = 95,
) -> dict:
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"cannot open {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames in {video_path}")

    idx = sample_indices(len(frames), src_fps, fps)
    H, W = size_hw
    out_dir = out_root / video_path.stem
    clips_dir = out_dir / "clips"
    clips_dir.mkdir(parents=True, exist_ok=True)

    clip_len = int(round(fps * clip_seconds))
    hop = int(round(fps * hop_seconds)) if hop_seconds > 0 else 0
    entries = []
    write_args = ([int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
                  if ext in ("jpg", "webp") else [])
    for ci, (a, b) in enumerate(chunk_ranges(len(idx), clip_len,
                                             drop_last=False, hop=hop)):
        cdir = clips_dir / f"clip_{ci:04d}"
        cdir.mkdir(parents=True, exist_ok=True)
        for fi, src_i in enumerate(idx[a:b]):
            img = center_resize_crop(frames[int(src_i)], H, W)
            cv2.imwrite(str(cdir / f"frame_{fi:06d}.{ext}"), img, write_args)
        entries.append(
            {
                "video_frames_dir": str(cdir),
                "source_video": str(video_path),
                "fps": fps,
                "clip_seconds": clip_seconds,
                "num_frames": int(b - a),
            }
        )
    manifest = {"clips": entries}
    (out_dir / "clips.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser(description="Extract fps-resampled frame clips from videos.")
    ap.add_argument("--input", type=Path, default=None,
                    help="Video file or directory tree of videos")
    ap.add_argument("--output", type=Path, default=None)
    # reference-compatible aliases (extract_frames.py:306-307)
    ap.add_argument("--input_path", dest="input_alias", type=Path, default=None)
    ap.add_argument("--output_dir", dest="output_alias", type=Path, default=None)
    ap.add_argument("--fps", type=float, default=16.0)
    ap.add_argument("--size", type=str, nargs="+", default=["128", "128"],
                    help="'128', 'HxW', or two ints")
    ap.add_argument("--clip-seconds", type=float, default=3.0)
    ap.add_argument("--hop-seconds", type=float, default=0.0,
                    help="hop between clips (0 = non-overlapping)")
    ap.add_argument("--ext", "--format", dest="ext", type=str, default="jpg",
                    choices=["jpg", "png", "webp"])
    ap.add_argument("--quality", type=int, default=95)
    ap.add_argument("--limit", type=int, default=0,
                    help="Process at most N videos (0 = all)")
    args = ap.parse_args(argv)
    args.input = args.input or args.input_alias
    args.output = args.output or args.output_alias
    if args.input is None or args.output is None:
        ap.error("supply --input/--output (or --input_path/--output_dir)")
    if len(args.size) == 1:
        args.size = list(parse_hw(args.size[0]))
    else:
        args.size = [int(x) for x in args.size]

    if args.input.is_file():
        videos = [args.input]
    else:
        videos = sorted(
            p for p in args.input.rglob("*") if p.suffix.lower() in VIDEO_EXTS
        )
    if args.limit:
        videos = videos[: args.limit]
    if not videos:
        sys.exit(f"no videos found under {args.input}")

    total_clips = 0
    for i, v in enumerate(videos):
        try:
            m = extract_for_video(
                v, args.output, args.fps, tuple(args.size), args.clip_seconds,
                args.ext, hop_seconds=args.hop_seconds, quality=args.quality,
            )
            total_clips += len(m["clips"])
            print(f"[{i + 1}/{len(videos)}] {v.name}: {len(m['clips'])} clips")
        except Exception as e:  # keep batch jobs alive on one bad file
            print(f"[skip] {v}: {e}")
    print(f"[done] {total_clips} clips -> {args.output}")


if __name__ == "__main__":
    main()
