"""Profiling + performance accounting (SURVEY §5: the reference has no
tracing/profiling anywhere; perf per chip is this framework's north star).

  * `trace(logdir)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/XProf.
  * `annotate(name)` — TraceAnnotation for host-side phases.
  * flops_* estimators — analytic FLOP counts for the MMDiT denoiser so
    step metrics can report model FLOPS utilization (MFU) against the chip
    peak; the roofline target in BASELINE.md is stated in these terms.
  * `device_memory_stats()` — live HBM usage per device when the backend
    exposes it.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax

# peak dense bf16 matmul throughput per chip (FLOP/s); v5e ~197 TFLOPs
PEAK_FLOPS = {
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v5p": 459e12,
    "tpu v4": 275e12,
    "cpu": 5e10,
}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('runs/prof'): step(...)`.

    NOTE: on this dev environment's tunneled TPU, start_trace can hang (the
    profiler service isn't reachable through the relay); traces work on CPU
    and on directly-attached TPUs."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_peak_flops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return PEAK_FLOPS["cpu"]
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return PEAK_FLOPS["cpu"]


# ---------------------------------------------------------------------------
# analytic FLOPs (forward; x3 for fwd+bwd)
# ---------------------------------------------------------------------------


def flops_mmdit_forward(n_tokens: int, d_model: int, n_layers: int,
                        mlp_ratio: float = 4.0) -> float:
    """Dense matmul FLOPs for one MMDiT forward pass of one sample.

    Per layer: qkv (2*N*d*3d) + attn scores/values (2*2*N^2*d) + out proj
    (2*N*d*d) + mlp (2*2*N*d*(ratio*d)).
    """
    N, d = n_tokens, d_model
    per_layer = (
        2 * N * d * 3 * d          # qkv projection
        + 4 * N * N * d            # QK^T and PV
        + 2 * N * d * d            # output projection
        + 4 * N * d * int(mlp_ratio * d)  # two mlp matmuls
    )
    return float(n_layers * per_layer)


def flops_denoiser_step(batch: int, n_tokens: int, d_model: int,
                        n_layers: int, mlp_ratio: float = 4.0,
                        cfg_dual: bool = True) -> float:
    """One DDIM step's denoiser FLOPs (batched CFG doubles the batch)."""
    mult = 2 if cfg_dual else 1
    return mult * batch * flops_mmdit_forward(n_tokens, d_model, n_layers,
                                              mlp_ratio)


def mfu(achieved_flops_per_sec: float) -> float:
    """Model FLOPS utilization vs the chip peak."""
    return achieved_flops_per_sec / device_peak_flops()


def calib_tflops(repeats: int = 3, inner: int = 8):
    """Measure the chip's ACHIEVABLE bf16 matmul rate right now: 4096^3
    matmul, min over `repeats` samples of `inner` chained device calls.

    The datasheet peak is unreachable on this shared/tunneled chip (the
    co-tenant moves throughput +-20% minute to minute), so MFU quoted
    against the same-minute calibration is the honest utilization number
    (PERFORMANCE.md "Denoiser MFU"; VERDICT r4 weak #7).  Returns None off
    TPU — a CPU 4096^3 matmul costs ~30 s and means nothing."""
    import time

    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return None
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    float(jnp.asarray(f(a)).ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        y = a
        t0 = time.perf_counter()
        for _ in range(inner):
            y = f(y)
        float(jnp.asarray(y).ravel()[0])  # forced readback sync
        best = min(best, (time.perf_counter() - t0) / inner)
    return 2 * 4096 ** 3 / best / 1e12


def device_memory_stats() -> Optional[Dict[str, float]]:
    try:
        stats = jax.devices()[0].memory_stats()
        if not stats:
            return None
        return {
            "bytes_in_use": float(stats.get("bytes_in_use", 0)),
            "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": float(stats.get("bytes_limit", 0)),
        }
    except Exception:
        return None
