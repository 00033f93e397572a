#!/usr/bin/env python3
"""Reduced-precision MXU probe: bf16 vs int8 vs fp8 matmuls + a calibration
SUITE (VERDICT r2 #8).

Two questions, answered by measurement on the attached chip:

  1. **Calibration suite** — the single-shape 4096^3 calibration matmul in
     tools/mfu_probe.py occasionally reads *below* the MMDiT core's
     achieved rate (the ">1x calib anomaly").  Running a SUITE of shapes
     (square sizes + the t2i core's actual GEMM shapes) and quoting
     best-of makes the calibration a true ceiling estimate: MFU-vs-calib
     should be quoted against `calib_best_tflops`.

  2. **Does dropping matmul precision below bf16 pay on this chip?**
     v5e's MXU has a native int8 path (nominally 2x bf16 throughput:
     394 TOPS vs 197 TFLOP/s datasheet); fp8 (float8_e4m3fn) is
     software-emulated on v5e (native only from v6e/Trillium) so it is
     expected NOT to pay here — the probe measures rather than assumes.
     Each precision also gets a numerics check against an fp32 reference
     on the t2i QKV projection (per-channel symmetric scaling for int8,
     plain cast for fp8), so the speed table comes with the accuracy cost
     attached.

Usage: python tools/quant_probe.py [--sizes 2048 4096 8192] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.mfu_probe import chain_time  # noqa: E402  (chained device timing)


def _rel_err(ref: np.ndarray, got: np.ndarray) -> float:
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    return float(np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-12))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[2048, 4096, 8192])
    ap.add_argument("--d", type=int, default=512,
                    help="t2i core width for the GEMM-shape calibration rows")
    ap.add_argument("--tokens", type=int, default=1152,
                    help="padded t2i sequence (1101 -> 1152 @ seq_multiple)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args(argv)

    from multimodal_diffusion_tpu.infer.sample_clip import select_device

    select_device(args.device)

    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    bf = jnp.bfloat16 if on_tpu else jnp.float32
    report = {"backend": jax.default_backend(),
              "device_kind": jax.devices()[0].device_kind}

    # ---------------- 1. calibration suite (bf16) ----------------
    # square sizes + the core's real GEMM shapes ([B*N, d] x [d, k*d])
    shapes = [(s, s, s) for s in args.sizes]
    BN = args.batch * args.tokens
    d = args.d
    shapes += [(BN, d, 3 * d),   # fused QKV projection
               (BN, d, 4 * d),   # MLP fc1
               (BN, 4 * d, d)]   # MLP fc2
    def paired_gemm(b, b_back, out_dtype):
        """x -> (x @ b) @ b_back, shape-preserving so chain_time can fold
        it; FLOP count for the pair is 4*m*k*n."""
        def f(x):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
                if out_dtype != jnp.int8 else jnp.int32,
            ).astype(out_dtype)
            return jax.lax.dot_general(
                y, b_back, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
                if out_dtype != jnp.int8 else jnp.int32,
            ).astype(out_dtype)
        return f

    calib = {}
    for (m, kk, n) in shapes:
        a = jax.random.normal(jax.random.PRNGKey(0), (m, kk), bf)
        b = jax.random.normal(jax.random.PRNGKey(1), (kk, n), bf)
        b_back = jax.random.normal(jax.random.PRNGKey(2), (n, kk), bf)
        t = chain_time(paired_gemm(b, b_back, bf), a, n_inner=10)
        calib[f"{m}x{kk}x{n}"] = round(4 * m * kk * n / t / 1e12, 1)
    report["calib_suite_bf16_tflops"] = calib
    report["calib_best_tflops"] = max(calib.values())

    # ---------------- 2. reduced-precision square matmuls ----------------
    M = max(args.sizes[:2]) if len(args.sizes) else 4096
    a32 = np.random.default_rng(0).normal(size=(M, M)).astype(np.float32)
    b32 = np.random.default_rng(1).normal(size=(M, M)).astype(np.float32)

    prec = {}

    # int8, per-channel symmetric scales (the deployment-realistic scheme)
    sa = np.abs(a32).max(axis=1, keepdims=True) / 127.0
    sb = np.abs(b32).max(axis=0, keepdims=True) / 127.0
    a8 = jnp.asarray(np.clip(np.rint(a32 / sa), -127, 127).astype(np.int8))
    b8 = jnp.asarray(np.clip(np.rint(b32 / sb), -127, 127).astype(np.int8))
    t_i8 = chain_time(paired_gemm(b8, b8.T, jnp.int8), a8, n_inner=10)
    prec["int8_tops"] = round(4 * M**3 / t_i8 / 1e12, 1)

    # fp8 e4m3 (cast-only scheme)
    t_f8 = None
    if hasattr(jnp, "float8_e4m3fn"):
        f8 = jnp.float8_e4m3fn
        a_f8 = jnp.asarray(a32 / 8.0).astype(f8)  # keep in e4m3 range
        b_f8 = jnp.asarray(b32 / 8.0).astype(f8)
        t_f8 = chain_time(paired_gemm(b_f8, b_f8.T, f8), a_f8, n_inner=10)
        prec["fp8_e4m3_tflops"] = round(4 * M**3 / t_f8 / 1e12, 1)

    # bf16 anchor at the same shape
    a_bf = jnp.asarray(a32, bf)
    b_bf = jnp.asarray(b32, bf)
    t_bf = chain_time(paired_gemm(b_bf, b_bf.T, bf), a_bf, n_inner=10)
    prec["bf16_tflops"] = round(4 * M**3 / t_bf / 1e12, 1)
    prec["int8_speedup_vs_bf16"] = round(t_bf / t_i8, 2)
    if "fp8_e4m3_tflops" in prec:
        prec["fp8_speedup_vs_bf16"] = round(t_bf / t_f8, 2)
    report["square_matmul"] = {"size": M, **prec}

    # ---------------- 3. numerics on the t2i QKV projection ----------------
    rng = np.random.default_rng(2)
    x32 = rng.normal(size=(BN, d)).astype(np.float32)
    w32 = (rng.normal(size=(d, 3 * d)) / np.sqrt(d)).astype(np.float32)
    ref = x32 @ w32

    err = {}
    y_bf = np.asarray(
        jnp.dot(jnp.asarray(x32, bf), jnp.asarray(w32, bf),
                preferred_element_type=jnp.float32))
    err["bf16_rel_err"] = round(_rel_err(ref, y_bf), 5)

    sx = np.abs(x32).max(axis=1, keepdims=True) / 127.0
    sw = np.abs(w32).max(axis=0, keepdims=True) / 127.0
    x8 = np.clip(np.rint(x32 / sx), -127, 127).astype(np.int8)
    w8 = np.clip(np.rint(w32 / sw), -127, 127).astype(np.int8)
    y_i8 = np.asarray(jax.lax.dot_general(
        jnp.asarray(x8), jnp.asarray(w8), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)).astype(np.float64) * sx * sw
    err["int8_rel_err"] = round(_rel_err(ref, y_i8), 5)

    if hasattr(jnp, "float8_e4m3fn"):
        f8 = jnp.float8_e4m3fn
        y_f8 = np.asarray(jax.lax.dot_general(
            jnp.asarray(x32).astype(f8), jnp.asarray(w32).astype(f8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        err["fp8_e4m3_rel_err"] = round(_rel_err(ref, y_f8), 5)
    report["qkv_numerics"] = err

    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
