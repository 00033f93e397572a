"""Blockwise (flash-style) attention — Pallas TPU kernel.

Online-softmax attention with VMEM-tiled Q blocks so memory is linear in
sequence length; this is what lets streaming windows grow past the mvp's 133
tokens without materializing the N^2 score matrix (SURVEY §2.B: "the Pallas
attention kernel should be written blockwise (flash-style) so sequence
growth is memory-linear").

Design (per /opt/skills/guides/pallas_guide.md):
  * grid = (B*H, ceil(N / BLOCK_Q)); each program owns one Q tile and loops
    the K/V tiles with the online max/sum update (MXU matmuls in fp32).
  * K/V for one (batch, head) live in VMEM (N x Dh — ~1 MB at N=2048,
    Dh=128, far under the ~16 MB budget); longer windows still fit because
    only O(N * Dh) is resident, never O(N^2).
  * padded tail keys are masked with a compile-time iota comparison
    (shapes are static, so no dynamic control flow).
  * backward: custom_vjp that recomputes attention with the XLA einsum path
    (exact same math) — training sequences are short; the kernel's win is
    the inference/scan hot loop.

The public wrapper pads N to the tile size and handles [B, H, N, Dh] I/O.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from .attention import mha_reference

BLOCK_Q = 128
BLOCK_K = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                  block_k: int):
    """One Q tile vs all K/V tiles, online softmax.

    q_ref: [1, BQ, Dh]; k_ref, v_ref: [1, N_pad, Dh]; o_ref: [1, BQ, Dh].
    """
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, Dh]
    n_pad = k_ref.shape[1]
    bq = q.shape[0]
    dh = q.shape[1]

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)

    num_kb = n_pad // block_k
    for kb in range(num_kb):  # static unroll: n_pad is compile-time
        k = k_ref[0, kb * block_k : (kb + 1) * block_k, :].astype(jnp.float32)
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        lo = kb * block_k
        if lo + block_k > n_valid:
            # mask padded keys (compile-time bound; iota must be >= 2D on TPU)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + lo
            s = jnp.where(col < n_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # [BQ, BK]
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, Dh = q.shape
    scale = 1.0 / (Dh**0.5)
    n_pad = -(-N // BLOCK_K) * BLOCK_K
    pad_q = -(-N // BLOCK_Q) * BLOCK_Q

    def flat_pad(x, target):
        x = x.reshape(B * H, N, Dh)
        if target > N:
            x = jnp.pad(x, ((0, 0), (0, target - N), (0, 0)))
        return x

    qf = flat_pad(q, pad_q)
    kf = flat_pad(k, n_pad)
    vf = flat_pad(v, n_pad)

    grid = (B * H, pad_q // BLOCK_Q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, n_valid=N, block_k=BLOCK_K
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, pad_q, Dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N, :].reshape(B, H, N, Dh)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, Dh] x3 -> [B, H, N, Dh]; softmax stats in fp32."""
    return _flash_forward(q, k, v)


def _fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    # exact recompute through the XLA path (same math as the kernel)
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: mha_reference(a, b, c), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_interpret(q, k, v):
    """Interpreter-mode entry for CPU tests of the kernel logic."""
    return _flash_forward(q, k, v, interpret=True)
