"""Text -> image sampling with CFG + negative prompts (BASELINE #2/#3):

    python -m multimodal_diffusion_tpu.infer.sample_t2i \
        --config configs/t2i_512.yaml --prompt "a red fox" \
        [--negative "blurry"] [--steps 50] [--guidance 5.0] [--out out.png]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from ..models.latent_text2image import (
    Text2ImageConfig, Text2ImageModel, sample_images,
)
from ..train.checkpoint import CheckpointManager
from ..train.trainer import compute_dtype_from_config
from ..utils.io import ensure_dir, load_config


def main(argv=None):
    ap = argparse.ArgumentParser(description="Text->image DDIM sampling w/ CFG")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--prompt", type=str, nargs="+", required=True)
    ap.add_argument("--negative", type=str, nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=None)
    ap.add_argument("--out-dir", type=Path, default=Path("t2i_samples"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)
    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cfg = load_config(*args.config)
    mcfg = Text2ImageConfig.from_config(cfg, dtype=compute_dtype_from_config(cfg))
    model = Text2ImageModel(mcfg)

    params = None
    ckpt_dir = Path(cfg["paths"]["ckpt_dir"])
    if ckpt_dir.exists():
        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            params = mgr.restore()["params"]
            print(f"[ckpt] restored step {mgr.latest_step()}")
        mgr.close()
    if params is None:
        print("[info] no checkpoint; sampling with random weights")
        from flax.core import meta

        from ..models.text_encoder import tokenize_text
        from ..ops import schedule as S

        _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(mcfg.steps))
        lat = (1, mcfg.vae.lat_ch, mcfg.latent_hw, mcfg.latent_hw)
        params = meta.unbox(model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 3, mcfg.image_size, mcfg.image_size)),
            jnp.asarray(tokenize_text(["x"], mcfg.text.max_len)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(lat, jnp.float32),
            jnp.asarray(abar),
        )["params"])

    steps = args.steps or int(cfg["diffusion"]["image"].get("sampler_steps", 50))
    guidance = args.guidance if args.guidance is not None else float(
        cfg.get("sampling", {}).get("guidance_scale", 5.0))
    negative = args.negative if args.negative else None
    sampler = str(cfg.get("sampling", {}).get("sampler", "ddim"))
    imgs = sample_images(model, params, args.prompt, negative=negative,
                         sampler_steps=steps, guidance_scale=guidance,
                         rng=jax.random.PRNGKey(args.seed), sampler=sampler)

    from PIL import Image

    ensure_dir(args.out_dir)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(args.out_dir / f"t2i_{i:04d}.png")
    print(f"[ok] wrote {len(imgs)} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
