#!/usr/bin/env python3
"""On-device decomposition of the FLAGSHIP train step (VERDICT r3 #4).

Round 2 decomposed the mvp conv-VAE step (143 ms = 58 VAE + 5 codec +
5 denoiser); the flagship moved to the patch-encoder d=1024/16L config
(configs/specificity7.yaml, 91 ms at batch 8, denoiser_mfu 0.073) and the
decomposition went stale.  This tool times each component of the CURRENT
step the same way bench.py does (sequential dispatches, one forced
host-readback sync, min-of-K — robust to the tunneled chip's interference
spikes), plus a 4096^3 bf16 calibration matmul as the achievable ceiling
at probe time.

Claims the chip first (utils/chip_claim.py), so it is safe to run while a
supervised campaign is live.

Usage:
    python tools/step_decompose.py \
        [--config configs/mvp.yaml configs/specificity7.yaml] [--batch 8] \
        [--out docs/step_decompose_v7.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, nargs="+",
                    default=["configs/mvp.yaml", "configs/specificity7.yaml"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if not args.cpu:
        from multimodal_diffusion_tpu.utils.chip_claim import acquire, release
        import atexit

        acquire(tag="step-decompose",
                log=lambda m: print(m, file=sys.stderr, flush=True))
        atexit.register(release)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_diffusion_tpu.train.trainer import create_trainer
    from multimodal_diffusion_tpu.utils.io import load_config
    from multimodal_diffusion_tpu.utils.profiling import (
        flops_mmdit_forward, mfu,
    )

    cfg = load_config(*args.config)
    cfg["data"]["batch_size"] = args.batch
    cfg["data"]["device_resident"] = False  # synthetic batches fed directly
    cfg["parallel"] = {"data": 1, "model": 1}
    bundle = create_trainer(cfg)
    model = bundle.model
    shapes = bundle.latent_shapes
    B = shapes["video"][0]
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(0, 1, shapes["video"]).astype(np.float32))
    audio = jnp.asarray(
        rng.uniform(-1, 1, shapes["audio"]).astype(np.float32))
    batch = {"video": video, "audio": audio,
             "has_video": jnp.ones(B, bool), "has_audio": jnp.ones(B, bool)}
    tiv = jnp.asarray(1.0, jnp.float32)

    def sync(x):
        return float(jnp.asarray(x).ravel()[0])  # forced host readback

    def timed(fn, *fargs, sync_of=lambda o: o):
        """min-of-K seconds/call: 2 warmups, then `inner` sequential
        dispatches + one sync per repeat (bench.py methodology).  Only the
        LAST dispatch's output is referenced: holding all of them OOMs the
        16 GB chip when the output is a full gradient tree (~1 GB x 20)."""
        sync(sync_of(fn(*fargs)))
        sync(sync_of(fn(*fargs)))
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.inner):
                o = fn(*fargs)
            sync(sync_of(o))
            ts.append((time.perf_counter() - t0) / args.inner)
        return float(np.min(ts))

    results = {}

    def flush():
        # partial results survive a mid-probe OOM/backend error
        if args.out:
            args.out.parent.mkdir(parents=True, exist_ok=True)
            args.out.write_text(json.dumps(
                {"config": args.config, "batch": B, "results": results},
                indent=2))

    # ---- calibration ceiling -------------------------------------------
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    t = timed(jax.jit(lambda x: (x @ x)), a)
    results["calib_4096_matmul_ms"] = t * 1e3
    results["calib_tflops"] = 2 * 4096**3 / t / 1e12

    # ---- full train step (threads donated state) -----------------------
    state, m = bundle.train_step(bundle.state, batch, tiv)
    sync(m["loss"])
    state, m = bundle.train_step(state, batch, tiv)
    sync(m["loss"])
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.inner):
            state, m = bundle.train_step(state, batch, tiv)
        sync(m["loss"])
        ts.append((time.perf_counter() - t0) / args.inner)
    results["train_step_ms"] = float(np.min(ts)) * 1e3
    flush()

    # ---- HBM bandwidth calibration + direct optimizer/EMA probe --------
    # the residual is elementwise (AdamW m/v/p updates + EMA lerp) —
    # HBM-bandwidth-bound, not MXU-bound; measure the chip's achievable
    # stream bandwidth in the same minute and the ACTUAL AdamW+EMA cost
    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB

    @jax.jit
    def saxpy(x):
        return x * 1.000001 + 0.5

    t = timed(saxpy, big)
    results["hbm_saxpy_1gib_ms"] = t * 1e3
    results["hbm_gbps"] = 2 * big.nbytes / t / 1e9  # read + write

    import optax

    tx = bundle.tx
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    @jax.jit
    def opt_ema(params, opt_state, ema, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * 0.999 + p.astype(e.dtype) * 0.001,
            ema, new_params if set(ema) == set(new_params)
            else new_params["core"])
        return new_params, new_opt, new_ema

    o = opt_ema(state.params, state.opt_state, state.ema_core, grads)
    sync(jax.tree_util.tree_leaves(o[0])[0])
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        oo = None
        for _ in range(args.inner):
            oo = opt_ema(state.params, state.opt_state, state.ema_core,
                         grads)
        sync(jax.tree_util.tree_leaves(oo[0])[0])
        ts.append((time.perf_counter() - t0) / args.inner)
    results["opt_ema_ms"] = float(np.min(ts)) * 1e3
    n_param_bytes = sum(x.nbytes for x in
                        jax.tree_util.tree_leaves(state.params))
    # AdamW traffic: read p,m,v,g + write p,m,v (7x); EMA: read e,p,
    # write e (3x, p re-read pessimistically)
    results["opt_ema_analytic_gb"] = 10 * n_param_bytes / 1e9
    results["opt_ema_implied_gbps"] = (
        results["opt_ema_analytic_gb"] / (results["opt_ema_ms"] / 1e3))
    del grads, o, oo, big
    flush()

    # free the optimizer + EMA shards (~2.3 GB at d=1024/16L) — the
    # component probes only need params, and the grad probe below needs
    # the headroom for its gradient tree
    params = state.params
    del state, bundle
    var = {"params": params}

    # ---- component forwards --------------------------------------------
    enc_v = jax.jit(lambda v: model.apply(var, v, method=model.encode_video))
    results["vae_encode_video_ms"] = timed(enc_v, video) * 1e3
    enc_a = jax.jit(lambda a_: model.apply(var, a_, method=model.encode_audio))
    results["codec_encode_audio_ms"] = timed(enc_a, audio) * 1e3
    z_v = enc_v(video)
    z_a = enc_a(audio)
    if getattr(model.cfg, "mouth_enabled", False):
        mt = jax.jit(lambda v: model.apply(var, v, method=model.mouth_tokens))
        results["mouth_tokens_ms"] = timed(mt, video) * 1e3
    dec_v = jax.jit(lambda z: model.apply(var, z, method=model.decode_video))
    results["vae_decode_video_ms"] = timed(dec_v, z_v) * 1e3
    dec_a = jax.jit(lambda z: model.apply(var, z, method=model.decode_audio))
    results["codec_decode_audio_ms"] = timed(dec_a, z_a) * 1e3
    flush()

    # ---- denoiser core: fwd and fwd+bwd --------------------------------
    t0_ = jnp.zeros((B,), jnp.int32)

    def denoise(p, zv, za):
        out = model.apply({"params": p}, zv, za, t0_, t0_,
                          method=model.denoise_latents)
        return out["eps_v"], out["eps_a"]

    den_fwd = jax.jit(denoise)
    results["denoiser_fwd_ms"] = timed(
        den_fwd, params, z_v, z_a, sync_of=lambda o: o[0]) * 1e3

    def den_loss(p, zv, za):
        ev, ea = denoise(p, zv, za)
        return jnp.sum(ev ** 2) + jnp.sum(ea ** 2)

    den_grad = jax.jit(jax.grad(den_loss))
    results["denoiser_fwd_bwd_ms"] = timed(
        den_grad, params, z_v, z_a,
        sync_of=lambda g: jax.tree_util.tree_leaves(g)[0]) * 1e3
    flush()

    # ---- optimizer + EMA cost by subtraction ---------------------------
    # full step = encoders + denoiser fwd+bwd (+ encoder bwd) + losses +
    # AdamW + EMA.  A loss-and-grad-only step isn't separately exposed;
    # the denoiser fwd/bwd + component forwards above bound the compute,
    # and (train_step - sum(parts)) is the optimizer/EMA/loss/residual.
    known = (results.get("vae_encode_video_ms", 0)
             + results.get("codec_encode_audio_ms", 0)
             + results.get("mouth_tokens_ms", 0)
             + results.get("vae_decode_video_ms", 0)   # recon loss decodes
             + results.get("codec_decode_audio_ms", 0)
             + results["denoiser_fwd_bwd_ms"])
    results["residual_opt_ema_losses_ms"] = results["train_step_ms"] - known

    # ---- MFU (same token/FLOP accounting as the trainer's logged
    # denoiser_mfu, trainer.py:645-660) ----------------------------------
    from multimodal_diffusion_tpu.ops.tokenize import num_chunks

    core = model.cfg.core
    tube = cfg["tokenizer"]["video"]["tube"]
    chunk = cfg["tokenizer"]["audio"]["chunk"]
    zv, za = shapes["z_video"], shapes["z_audio"]
    n_v = (zv[2] // int(tube["t"])) * (zv[3] // int(tube["h"])) \
        * (zv[4] // int(tube["w"]))
    n_a = num_chunks(za[2], int(chunk["length"]), int(chunk["stride"]))
    results["n_tokens_va"] = n_v + n_a
    fwd_flops = B * flops_mmdit_forward(
        n_v + n_a, core.d_model, core.n_layers, core.mlp_ratio)
    results["denoiser_fwd_tflops"] = (
        fwd_flops / (results["denoiser_fwd_ms"] / 1e3) / 1e12)
    results["denoiser_fwd_bwd_tflops"] = (
        3 * fwd_flops / (results["denoiser_fwd_bwd_ms"] / 1e3) / 1e12)
    results["denoiser_fwd_bwd_vs_calib"] = (
        results["denoiser_fwd_bwd_tflops"] / results["calib_tflops"])
    results["step_denoiser_mfu_datasheet"] = mfu(
        3 * fwd_flops / (results["train_step_ms"] / 1e3))
    results["params_m"] = float(
        sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6)

    print(json.dumps(results, indent=2))
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(
            {"config": args.config, "batch": B, "results": results}, indent=2))


if __name__ == "__main__":
    main()
