#!/usr/bin/env python3
"""MFU decomposition probe for the denoiser hot path (BASELINE.md roofline
north star).  Measures, with chained on-device loops (no per-iter host
sync):

  1. calibration: big bf16 matmul TFLOP/s — the *achievable* peak at probe
     time (the shared/tunneled chip's effective capacity varies by >10x
     with co-tenant load, so raw MFU against the 197 TFLOP/s datasheet is
     meaningless unless calibration is near peak);
  2. MMDiT core forward at the t2i-512 shape (N=1101, d=512, 8L, CFG batch);
  3. attention op alone (flash kernel vs XLA reference);
  4. the full t2i-512 sampler step cost implied by bench.

Prints a JSON report.  Run when the chip is quiet; compare `calib_tflops`
across runs to detect contention.

Usage: python tools/mfu_probe.py [--batch 8] [--d 512] [--layers 8]
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


def chain_time(fn, x0, n_inner=20, repeats=5):
    """Best per-call seconds of fn chained n_inner times on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(i, xx):
            return (fn(xx) * 1e-6 + xx).astype(xx.dtype)
        return jax.lax.fori_loop(0, n_inner, body, x)

    def sync(t):
        # device-side ravel+index: transfers 4 bytes, not the whole array
        # (np.asarray here would pull 64 MB per sync through the tunnel and
        # dominate every measurement)
        return float(jnp.asarray(t).ravel()[0])

    sync(loop(x0))
    sync(loop(x0))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(loop(x0))
        ts.append((time.perf_counter() - t0) / n_inner)
    return float(np.min(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="CFG-doubled batch hitting the core (t2i b4 -> 8)")
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=1101,
                    help="1024 image + 77 text tokens at t2i-512")
    ap.add_argument("--seq-multiple", type=int, default=1,
                    help="MMDiTConfig.seq_multiple (128 = MXU tile padding)")
    ap.add_argument("--masked", action="store_true",
                    help="mask a text-PAD-like prefix (the real sampler path)")
    ap.add_argument("--calib-size", type=int, default=4096)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from multimodal_diffusion_tpu.ops.attention import mha_reference
    from multimodal_diffusion_tpu.ops.flash_attention import flash_attention
    from multimodal_diffusion_tpu.utils.profiling import (
        device_peak_flops, flops_mmdit_forward,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    report = {"backend": jax.default_backend(),
              "device_kind": jax.devices()[0].device_kind,
              "peak_tflops_datasheet": device_peak_flops() / 1e12}

    # 1. calibration matmul
    M = args.calib_size
    cal_b = jax.random.normal(jax.random.PRNGKey(1), (M, M), dtype)
    cal_a = jax.random.normal(jax.random.PRNGKey(0), (M, M), dtype)
    t_cal = chain_time(
        lambda x: jnp.dot(x, cal_b, preferred_element_type=jnp.float32)
        .astype(dtype),
        cal_a,
    )
    report["calib_tflops"] = round(2 * M**3 / t_cal / 1e12, 1)

    # 2. MMDiT core forward at t2i shape
    B, N, d = args.batch, args.tokens, args.d
    core = MMDiT(MMDiTConfig(d_model=d, n_layers=args.layers,
                             n_heads=args.heads, dropout=0.0,
                             gelu_exact=False, dtype=dtype,
                             seq_multiple=args.seq_multiple))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, N, d), dtype)
    mask = None
    if args.masked:
        # ~half the 77 text tokens padded, image tokens all valid — the
        # shape of the real t2i CFG sampler batch
        mask = jnp.zeros((B, N), bool).at[:, 40:77].set(True)
    params = core.init({"params": jax.random.PRNGKey(3)},
                       jnp.zeros((1, 8, d), jnp.float32))["params"]
    t_core = chain_time(lambda xx: core.apply({"params": params}, xx, mask), x,
                        n_inner=10)
    # FLOPs counted at the true N (pad-row work is overhead the kernel pays,
    # not useful math — MFU must not credit it)
    fl_core = B * flops_mmdit_forward(N, d, args.layers)
    report["core_fwd_ms"] = round(t_core * 1e3, 3)
    report["core_tflops"] = round(fl_core / t_core / 1e12, 1)
    report["core_mfu_vs_datasheet"] = round(
        fl_core / t_core / device_peak_flops(), 3)
    report["core_mfu_vs_calib"] = round(
        (fl_core / t_core) / (2 * M**3 / t_cal), 3)

    # 3. attention op alone
    H, Dh = args.heads, d // args.heads
    qkv_shape = (B, H, N, Dh)
    q = jax.random.normal(jax.random.PRNGKey(4), qkv_shape, dtype)
    k = jax.random.normal(jax.random.PRNGKey(5), qkv_shape, dtype)
    v = jax.random.normal(jax.random.PRNGKey(6), qkv_shape, dtype)
    fl_attn = 4 * N * N * Dh * B * H

    def wrap_attn(attn):
        def f(qq):
            return attn(qq, k, v)[..., :]
        return f

    t_ref = chain_time(wrap_attn(lambda a, b_, c: mha_reference(a, b_, c)),
                       q, n_inner=10)
    report["attn_ref_ms"] = round(t_ref * 1e3, 3)
    report["attn_ref_tflops"] = round(fl_attn / t_ref / 1e12, 1)
    if on_tpu:
        t_fl = chain_time(wrap_attn(lambda a, b_, c: flash_attention(a, b_, c)),
                          q, n_inner=10)
        report["attn_flash_ms"] = round(t_fl * 1e3, 3)
        report["attn_flash_tflops"] = round(fl_attn / t_fl / 1e12, 1)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
