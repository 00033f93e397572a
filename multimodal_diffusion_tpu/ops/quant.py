"""Dynamic int8 (W8A8) matmul for inference: `model.core.quant: "int8"`.

The v5e MXU has a native int8 path at nominally 2x bf16 throughput
(394 TOPS vs 197 TFLOP/s datasheet); this module makes the MMDiT core's
four hot projections (fused QKV, attention out, MLP fc1/fc2) run on it
at inference time with zero checkpoint-format changes:

  * weights stay fp32 in params; they are quantized IN-GRAPH per output
    channel (symmetric absmax).  Inside the DDIM `lax.scan` sampler the
    kernel is loop-invariant, so XLA's while-loop invariant code motion
    hoists the weight quantization out of the 50-step loop — it costs one
    pass per sample call, not one per step.
  * activations are quantized per row (per token, symmetric absmax over
    the contraction dim) each call — the standard dynamic-quant scheme.
  * the int8 x int8 -> int32 `lax.dot_general` result is rescaled by the
    two scale vectors in fp32 and cast back to the caller's dtype.

Numerics: per-channel weight + per-token activation symmetric quant gives
~1e-2 relative error per matmul on gaussian data (cf. tools/quant_probe.py
measurements); parity bounds are pinned in tests/test_quant.py.

Inference-only by design: the rounding has no useful gradient and the
sampler is the surface that wants the throughput, so MMDiT engages this
dot only when `deterministic=True` (training keeps the fp32/bf16 path —
models/mmdit.py).  Reference has no quantization anywhere (its inference
is the fp32 sampler, sample_clip.py:221-394); this is a TPU-native
extension, not a parity item.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rowwise(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8):
    """Symmetric absmax int8 quantization along `axis`.

    Returns (q int8, scale fp32) with x ~= q * scale; scale keeps the
    reduced axis as size 1 so `q * scale` broadcasts back.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dot_general(lhs: jnp.ndarray, rhs: jnp.ndarray,
                     dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in `dot_general` for flax `nn.Dense` (W8A8 dynamic).

    Supports the Dense contraction pattern only — lhs's LAST dim against
    rhs's dim 0, no batch dims — which is all nn.Dense ever emits."""
    (lc, rc), (lb, rb) = dimension_numbers
    if (tuple(lb), tuple(rb)) != ((), ()) or tuple(lc) != (lhs.ndim - 1,) \
            or tuple(rc) != (0,):
        raise NotImplementedError(
            f"int8_dot_general supports the nn.Dense pattern only, got "
            f"{dimension_numbers}")
    a8, sa = quantize_rowwise(lhs, axis=-1)          # per token
    w8, sw = quantize_rowwise(rhs, axis=0)           # per output channel
    y = jax.lax.dot_general(a8, w8, dimension_numbers,
                            preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * sa * sw            # [..., out] broadcasts
    out_dtype = preferred_element_type or lhs.dtype
    return out.astype(out_dtype)
