"""Sample images from a trained pixel-space DDPM (BASELINE config #1):

    python -m multimodal_diffusion_tpu.infer.sample_pixel \
        --config configs/pixel32.yaml --num 16 --out-dir samples/ [--device cpu]

Runs the full 1000-step ancestral sampler as one on-device lax.scan.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.image_diffusion import (
    PixelDiT, PixelDiTConfig, make_ancestral_sampler,
)
from ..train.checkpoint import CheckpointManager
from ..train.trainer import compute_dtype_from_config
from ..utils.io import ensure_dir, load_config


def main(argv=None):
    ap = argparse.ArgumentParser(description="Pixel DDPM ancestral sampling")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--out-dir", type=Path, default=Path("pixel_samples"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)
    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cfg = load_config(*args.config)
    mcfg = PixelDiTConfig.from_config(cfg, dtype=compute_dtype_from_config(cfg))
    model = PixelDiT(mcfg)

    ckpt_dir = Path(cfg["paths"]["ckpt_dir"])
    if ckpt_dir.exists():
        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            params = mgr.restore()["params"]
            print(f"[ckpt] restored step {mgr.latest_step()}")
        else:
            params = _random_params(model, mcfg)
            print("[warn] no checkpoints; random weights")
        mgr.close()
    else:
        params = _random_params(model, mcfg)
        print("[info] no ckpt dir; random weights")

    sample = jax.jit(make_ancestral_sampler(model), static_argnums=(2,))
    imgs = sample(params, jax.random.PRNGKey(args.seed), args.num)
    imgs = np.asarray(jax.device_get(imgs))  # [N, C, H, W] in [-1, 1]
    imgs_u8 = ((imgs.transpose(0, 2, 3, 1) + 1.0) * 127.5).astype(np.uint8)

    from PIL import Image

    ensure_dir(args.out_dir)
    for i, im in enumerate(imgs_u8):
        Image.fromarray(im.squeeze() if im.shape[-1] == 1 else im).save(
            args.out_dir / f"sample_{i:04d}.png")
    print(f"[ok] wrote {len(imgs_u8)} images -> {args.out_dir}")


def _random_params(model, mcfg):
    from flax.core import meta

    return meta.unbox(model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, mcfg.channels, mcfg.image_size, mcfg.image_size)),
        jnp.zeros((1,), jnp.int32),
    )["params"])


if __name__ == "__main__":
    main()
