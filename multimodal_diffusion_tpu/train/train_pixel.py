"""Unconditional pixel-space DDPM training (BASELINE config #1).

    python -m multimodal_diffusion_tpu.train.train_pixel \
        --config configs/pixel32.yaml [--max-steps N] [--device cpu]

Trains PixelDiT on a directory of images; checkpoints via the shared orbax
manager.  Images are center-cropped/resized to `image.size` and scaled to
[-1, 1] on the host.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.image_diffusion import (
    PixelDiT, PixelDiTConfig, make_pixel_train_step,
)
from ..train.checkpoint import CheckpointManager
from ..train.metrics import MetricWriter
from ..train.trainer import compute_dtype_from_config, make_optimizer
from ..utils.io import load_config

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def iter_image_batches(root, size: int, batch: int, seed: int = 0
                       ) -> Iterator[np.ndarray]:
    """Infinite stream of [B, C, size, size] float32 in [-1, 1]."""
    from PIL import Image

    paths: List[Path] = sorted(
        p for p in Path(root).rglob("*") if p.suffix.lower() in _IMG_EXTS
    )
    if not paths:
        raise FileNotFoundError(f"no images under {root}")
    # native fast path: one threaded C++ call decodes the whole batch when
    # every file is a JPEG (square images; plain resize == the PIL path)
    native = None
    if all(p.suffix.lower() in (".jpg", ".jpeg") for p in paths):
        try:
            from ..datasets import native_loader

            if native_loader.available():
                native = native_loader
        except Exception:
            native = None

    rng = np.random.default_rng(seed)
    while True:
        idx = rng.permutation(len(paths))
        for i in range(0, len(idx) - batch + 1, batch):
            sel = [paths[j] for j in idx[i : i + batch]]
            if native is not None:
                u8 = native.decode_clip_u8(sel, size, size)  # [B, H, W, 3]
                yield (u8.astype(np.float32) / 127.5 - 1.0).transpose(0, 3, 1, 2)
                continue
            imgs = []
            for p in sel:
                im = Image.open(p).convert("RGB")
                w, h = im.size
                s = min(w, h)
                im = im.crop(((w - s) // 2, (h - s) // 2,
                              (w + s) // 2, (h + s) // 2))
                im = im.resize((size, size), Image.BILINEAR)
                imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
            yield np.stack(imgs).transpose(0, 3, 1, 2)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Unconditional pixel DDPM training")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)
    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cfg = load_config(*args.config)
    dtype = compute_dtype_from_config(cfg)
    mcfg = PixelDiTConfig.from_config(cfg, dtype=dtype)
    model = PixelDiT(mcfg)

    B = int(cfg["data"]["batch_size"])
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    from flax.core import meta

    params = meta.unbox(model.init(
        {"params": rng},
        jnp.zeros((1, mcfg.channels, mcfg.image_size, mcfg.image_size)),
        jnp.zeros((1,), jnp.int32),
    )["params"])

    tx, _ = make_optimizer(cfg)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_pixel_train_step(model, tx))

    writer = MetricWriter(cfg["paths"]["log_dir"])
    ckpt = CheckpointManager(cfg["paths"]["ckpt_dir"])
    max_steps = args.max_steps or int(cfg["training"]["max_steps"])
    log_every = int(cfg["training"].get("log_every", 100))
    ckpt_every = int(cfg["training"].get("ckpt_every", 5000))

    batches = iter_image_batches(cfg["data"]["train_images"],
                                 mcfg.image_size, B,
                                 seed=int(cfg.get("seed", 0)))
    key = jax.random.PRNGKey(1)
    step = 0
    for batch in batches:
        if step >= max_steps:
            break
        params, opt_state, key, loss = step_fn(params, opt_state, key,
                                               jnp.asarray(batch))
        step += 1
        if step % log_every == 0:
            l = float(loss)
            writer.write(step, {"loss": l})
            print(f"step {step}: loss={l:.4f}")
        if step % ckpt_every == 0:
            ckpt.save(step, {"step": step, "params": jax.device_get(params)})
    ckpt.save(step, {"step": step, "params": jax.device_get(params)}, wait=True)
    ckpt.close()
    writer.close()
    print(f"[done] step {step}")


if __name__ == "__main__":
    main()
