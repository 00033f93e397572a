#!/usr/bin/env python3
"""Convert a clips.json manifest tree into pre-decoded `.avrec` shards.

    python tools/build_records.py --config configs/mvp.yaml \
        [--out data/records] [--clips-per-shard 256] [--limit N]

Decodes every clip ONCE (native C++ JPEG decoder when available, threaded)
into fixed-shape uint8 frames + float32 waveforms, packed into memory-
mappable shards (multimodal_diffusion_tpu/datasets/records.py).  Training
with `data.records_dir` then reads them zero-copy — no codec work in the
input loop, which on the round-1 dev host was a 12-35x underfeed vs the
jitted step (PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--out", type=Path, default=None,
                    help="output dir (default: <manifest dir>/records)")
    ap.add_argument("--clips-per-shard", type=int, default=256)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset
    from multimodal_diffusion_tpu.datasets.records import write_record_shards
    from multimodal_diffusion_tpu.utils.io import load_config

    cfg = load_config(*args.config)
    manifest = cfg["data"]["train_split_glob"]
    ds = AVClipsDataset(
        manifest_path=manifest,
        clip_seconds=float(cfg["data"]["clip_seconds"]),
        fps=int(cfg["video"]["fps"]),
        sr=int(cfg["audio"]["sr"]),
        size_hw=tuple(cfg["video"]["size"]),
        video_root=cfg.get("paths", {}).get("video_root"),
        audio_root=cfg.get("paths", {}).get("audio_root"),
        device_preprocess=True,  # records store uint8 [T, H, W, 3]
    )
    n = len(ds) if args.limit is None else min(len(ds), args.limit)
    out = args.out or (Path(manifest).parent / "records")
    H, W = (int(x) for x in cfg["video"]["size"])

    t0 = time.time()

    def items():
        for i in range(n):
            try:
                it = ds[i]
            except Exception as e:
                print(f"[skip] clip {i}: {e}")
                continue
            a = it.get("audio")
            yield {
                "video": it.get("video"),
                "audio": None if a is None else np.asarray(a).reshape(-1),
            }
            if (i + 1) % 50 == 0:
                rate = (i + 1) / (time.time() - t0)
                print(f"[build] {i + 1}/{n} clips ({rate:.1f} clips/s)")

    paths = write_record_shards(
        items(), out,
        video_shape=(ds.T, H, W, 3),
        audio_shape=(ds.L,),
        clips_per_shard=args.clips_per_shard,
        fps=int(cfg["video"]["fps"]), sr=int(cfg["audio"]["sr"]),
    )
    dt = time.time() - t0
    print(f"[done] {n} clips -> {len(paths)} shards in {out} ({dt:.1f}s)")


if __name__ == "__main__":
    main()
