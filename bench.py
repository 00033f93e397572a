#!/usr/bin/env python3
"""Headline benchmark — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the reference's own headline task at matched config (BASELINE.md):
mvp-scale MMDiT (d=512, 8 layers, 133 tokens/clip), DDIM 50 steps with
classifier-free guidance, video->audio direction, full pipeline
(VAE-encode prompt -> scan-DDIM with batched-CFG dual forward -> codec
decode).  Metric: clips/sec/chip.  vs_baseline divides by the measured
PyTorch-reference CPU throughput at the identical config
(BASELINE_MEASURED.json; the reference publishes no numbers, SURVEY §6).

Run: python bench.py [--batch 8] [--steps 50] [--repeats 3] [--direction v2a]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="clips per device batch (throughput mode)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--direction", choices=["v2a", "a2v"], default="v2a")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax.core import meta

    from multimodal_diffusion_tpu.infer.ddim import sampler_from_config
    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )
    from multimodal_diffusion_tpu.utils.io import load_config

    cfg = load_config(REPO / "configs" / "mvp.yaml")
    cfg["diffusion"]["video"]["sampler_steps"] = args.steps
    cfg["diffusion"]["audio"]["sampler_steps"] = args.steps

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = AVDiffusionModel(AVDiffusionConfig.from_config(cfg, dtype=dtype))

    B = args.batch
    rng = jax.random.PRNGKey(0)
    z_v = jax.random.normal(rng, (B, 8, 12, 16, 16), jnp.float32)
    z_a = jax.random.normal(rng, (B, 8, 150), jnp.float32)
    video = jax.random.uniform(rng, (B, 3, 48, 128, 128), jnp.float32)
    audio = jax.random.uniform(rng, (B, 1, 48000), jnp.float32, -1, 1)

    variables = model.init(
        {"params": rng}, z_v, z_a,
        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        method=model.denoise_latents,
    )
    # init decoders/encoders too
    variables2 = model.init({"params": rng}, video[:1, :, :, :, :], method=model.encode_video)
    del variables2
    params = meta.unbox(
        model.init(
            {"params": rng}, video, audio,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            jnp.zeros_like(z_v), jnp.zeros_like(z_a),
            jnp.ones((1000,), jnp.float32), jnp.ones((1000,), jnp.float32),
        )["params"]
    )

    target = "audio" if args.direction == "v2a" else "video"
    sample, _ = sampler_from_config(model, cfg, target=target)

    @jax.jit
    def pipeline(params, video, audio, key):
        var = {"params": params}
        if target == "audio":
            z_prompt = model.apply(var, video, method=model.encode_video)
            z_init = jax.random.normal(key, (B, 8, 150), jnp.float32)
            z = sample(params, z_prompt, z_init, key)
            return model.apply(var, z, method=model.decode_audio)
        z_prompt = model.apply(var, audio, method=model.encode_audio)
        z_init = jax.random.normal(key, (B, 8, 12, 16, 16), jnp.float32)
        z = sample(params, z_prompt, z_init, key)
        return model.apply(var, z, method=model.decode_video)

    key = jax.random.PRNGKey(1)
    out = pipeline(params, video, audio, key)  # compile + warmup
    jax.block_until_ready(out)

    times = []
    for i in range(args.repeats):
        k = jax.random.PRNGKey(2 + i)
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(params, video, audio, k))
        times.append(time.perf_counter() - t0)

    t_med = float(np.median(times))
    clips_per_sec = B / t_med

    baseline_file = REPO / "BASELINE_MEASURED.json"
    vs_baseline = 0.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        ref = base["results"].get(args.direction, {}).get("clips_per_sec")
        if ref:
            vs_baseline = clips_per_sec / float(ref)

    print(json.dumps({
        "metric": f"{args.direction}_clips_per_sec_{args.steps}step_cfg_"
                  f"b{B}_{jax.default_backend()}",
        "value": round(clips_per_sec, 4),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
