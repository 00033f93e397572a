#!/usr/bin/env python3
"""Run the PyTorch reference's training loop in this environment.

For the round-2 quality-parity experiment (BASELINE.md parity row): train
the reference (`/root/reference`, read-only) and this framework on the SAME
manifest/config (configs/parity_tiny.yaml) for the same step budget, then
compare eps-loss curves and sampled A<->V quality metrics.

The image lacks libsndfile/librosa wheels the reference dataset imports, so
tools/ref_shims/ (wave-stdlib soundfile.read, linear-interp resample) is put
on sys.path ahead of them.  The reference package itself is not modified.

Usage:
    python tools/train_reference.py --config configs/parity_tiny.yaml \
        [overlay.yaml ...] [--max-steps N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, nargs="+",
                    default=[str(REPO / "configs" / "parity_tiny.yaml")])
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--tag", type=str, default="ref",
                    help="suffix for the run dirs (keeps ours/theirs apart)")
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint .pt to warm-start from (the reference "
                         "trainer itself has no resume path, SURVEY §5; this "
                         "restores module/opt/EMA/step state around it)")
    ap.add_argument("--ckpt-every", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, str(REPO / "tools" / "ref_shims"))
    sys.path.insert(0, str(REFERENCE))

    import yaml

    # merge configs left->right like both frameworks' loaders do
    cfg = {}

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v

    for p in args.config:
        with open(p) as f:
            deep(cfg, yaml.safe_load(f))
    cfg["device"] = "cpu"
    cfg["experiment"] = f"{cfg.get('experiment', 'parity')}_{args.tag}"
    for key in ("out_root", "ckpt_dir", "log_dir", "samples_dir"):
        cfg["paths"][key] = cfg["paths"][key].replace(
            "parity_tiny", f"parity_tiny_{args.tag}")
    if args.max_steps is not None:
        cfg["training"]["max_steps"] = int(args.max_steps)
    if args.ckpt_every is not None:
        cfg["training"]["ckpt_every"] = int(args.ckpt_every)
    if args.log_every is not None:
        cfg["training"]["log_every"] = int(args.log_every)

    merged = REPO / "runs" / f"parity_tiny_{args.tag}" / "config.yaml"
    merged.parent.mkdir(parents=True, exist_ok=True)
    with open(merged, "w") as f:
        yaml.safe_dump(cfg, f)

    import torch

    torch.manual_seed(int(cfg.get("seed", 0)))

    from avdiff.datasets.av_manifest import AVClipsDataset
    from avdiff.models.train.trainer import AVTrainer

    train_ds = AVClipsDataset(
        manifest_path=cfg["data"]["train_split_glob"],
        video_root=cfg["paths"]["video_root"],
        audio_root=cfg["paths"]["audio_root"],
        fps=cfg["video"]["fps"],
        sr=cfg["audio"]["sr"],
        clip_seconds=cfg["data"]["clip_seconds"],
        size_hw=tuple(cfg["video"]["size"]),
    )
    print(f"[ref-train] {len(train_ds)} clips; "
          f"max_steps={cfg['training']['max_steps']}")

    trainer = AVTrainer(cfg=cfg, dataset_train=train_ds, dataset_val=None,
                        rank=0, world_size=1)
    if args.resume:
        state = torch.load(args.resume, map_location="cpu", weights_only=False)
        for name in ("core", "head", "adapt_v", "adapt_a",
                     "vid_vae", "aud_codec"):
            getattr(trainer, name).load_state_dict(state[name])
        trainer.opt.load_state_dict(state["opt"])
        if trainer.ema is not None and "ema" in state:
            trainer.ema.shadow = {k: v.clone()
                                  for k, v in state["ema"].items()}
        trainer.state.step = int(state["step"])
        print(f"[ref-train] resumed from {args.resume} @ step "
              f"{trainer.state.step}")
    max_steps = int(cfg["training"]["max_steps"])
    while trainer.state.step < max_steps:
        trainer.train_one()

    ckpt = Path(cfg["paths"]["ckpt_dir"]) / f"{cfg['experiment']}_final.pt"
    trainer.save_checkpoint(ckpt)
    print(f"[ref-train] saved final checkpoint -> {ckpt}")


if __name__ == "__main__":
    main()
