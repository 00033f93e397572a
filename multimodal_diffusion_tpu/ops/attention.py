"""Multi-head attention compute op.

Two interchangeable backends behind one functional interface:

  * `mha_reference` — plain jnp einsum attention.  XLA already fuses the
    softmax chain well at short sequence lengths (the mvp workload is
    Nv+Na = 133 tokens, SURVEY §2.A), and on CPU this is the only path.
  * `flash_attention` (ops/flash_attention.py) — blockwise Pallas TPU kernel
    (online softmax, VMEM-tiled) used automatically on TPU when the padded
    sequence length crosses `FLASH_MIN_SEQ`, so streaming windows can grow
    with memory-linear cost (SURVEY §5 long-context note).

Softmax statistics are computed in fp32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# below this (padded) sequence length the plain XLA path is faster than
# paying pallas_call overhead; flash attention shines on long windows.
# Overridable via env (MMDT_FLASH_MIN_SEQ) for benchmarking either path.
import os as _os

FLASH_MIN_SEQ = int(_os.environ.get("MMDT_FLASH_MIN_SEQ", 1024))


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q, k, v: [B, H, N, Dh];  bias: broadcastable to [B, H, N, N] (additive,
    -inf to mask).  Returns [B, H, N, Dh] in q.dtype.
    """
    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    key_padding_mask: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch between the Pallas flash kernel and the XLA reference path.

    `key_padding_mask`: [B, N] bool, True = PAD — preferred over a prebuilt
    `bias` because the flash kernel masks keys in-kernel (the XLA fallback
    expands it to an additive bias).  `use_flash=None` auto-selects: TPU
    backend AND seq >= FLASH_MIN_SEQ AND no *arbitrary* bias (key-padding
    masks are supported in-kernel; any other bias forces the XLA path).
    """
    if use_flash is None:
        on_tpu = jax.default_backend() == "tpu"
        use_flash = on_tpu and q.shape[-2] >= FLASH_MIN_SEQ and bias is None
    if use_flash and bias is None:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, key_padding_mask)
    if key_padding_mask is not None:
        kbias = padding_bias(key_padding_mask, q.shape[1])
        bias = kbias if bias is None else bias + kbias
        out = mha_reference(q, k, v, bias)
        # degenerate all-keys-masked batch element: the finite -1e30 bias
        # cancels in softmax (uniform attention over pads), while the flash
        # kernel returns exact zeros — zero here too so the backends agree
        all_pad = jnp.all(key_padding_mask, axis=-1)  # [B]
        return jnp.where(all_pad[:, None, None, None], 0.0, out).astype(
            out.dtype)
    return mha_reference(q, k, v, bias)


def padding_bias(key_padding_mask: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, N] bool (True = PAD) -> additive bias [B, 1, 1, N] with -inf at pads.

    Matches torch MultiheadAttention key_padding_mask semantics
    (reference mmdt.py:58-61): padded *keys* are unattendable by every query.
    """
    neg = jnp.asarray(-1e30, jnp.float32)
    return jnp.where(key_padding_mask[:, None, None, :], neg, 0.0)
