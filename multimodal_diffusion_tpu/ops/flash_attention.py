"""Blockwise (flash-style) attention — Pallas TPU kernels, fwd + bwd.

Online-softmax attention with VMEM-tiled Q blocks so memory is linear in
sequence length; this is what lets streaming windows grow past the mvp's 133
tokens without materializing the N^2 score matrix (SURVEY §2.B: "the Pallas
attention kernel should be written blockwise (flash-style) so sequence
growth is memory-linear").

Design (per /opt/skills/guides/pallas_guide.md):
  * forward: grid = (B*H, ceil(N / BLOCK_Q)); each program owns one Q tile
    and loops the K/V tiles with the online max/sum update (MXU matmuls in
    fp32).  Also emits the per-row logsumexp as the softmax residual.
  * backward: TWO blockwise kernels recomputing probabilities from the saved
    logsumexp (FlashAttention-2 scheme) — dK/dV gridded over K tiles looping
    Q tiles, dQ gridded over Q tiles looping K tiles; dS = P * (dP - D) with
    D = rowsum(dO * O) precomputed in XLA.  Nothing N^2 is ever resident, so
    long-window TRAINING is memory-linear too (round-1 used an O(N^2) XLA
    recompute here).
  * K/V for one (batch, head) live in VMEM (N x Dh — ~1 MB at N=2048,
    Dh=128, far under the ~16 MB budget); longer windows still fit because
    only O(N * Dh) is resident, never O(N^2).
  * padded tail keys are masked with a compile-time iota comparison; padded
    queries carry zero dO (the wrapper zero-pads), which zeroes their dK/dV
    contributions without explicit row masks.

The public wrapper pads N to the tile size and handles [B, H, N, Dh] I/O.
Kernels run in interpreter mode automatically off-TPU (CPU tests).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

BLOCK_Q = 128
BLOCK_K = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(*refs, scale: float, n_valid: int, block_k: int,
                      has_mask: bool):
    """One Q tile vs all K/V tiles, online softmax.

    q_ref: [1, BQ, Dh]; k_ref, v_ref: [1, N_pad, Dh]; valid_ref (only when
    has_mask): [1, N_pad] fp32 1=attendable key, 0=masked (key-padding AND
    length padding pre-combined on the host); o_ref: [1, BQ, Dh];
    lse_ref: [1, BQ, 1] (logsumexp of the scaled scores, the bwd residual;
    trailing singleton keeps the block's last-two dims TPU-tileable).
    """
    # native-dtype (bf16) MXU inputs, fp32 accumulation: fp32 operands run
    # the MXU at a fraction of peak; softmax statistics stay fp32 (same
    # structure as mha_reference, so numerics match the XLA path)
    if has_mask:
        q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        valid_ref = None
    q = q_ref[0]  # [BQ, Dh]
    n_pad = k_ref.shape[1]
    bq = q.shape[0]
    dh = q.shape[1]

    # finite sentinel (not -inf): a key-padding mask can blank an entire K
    # block, and -inf statistics would give exp(-inf - -inf) = nan; with the
    # where-based p below, masked columns contribute exactly 0 regardless.
    m = jnp.full((bq, 1), -1e30, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)

    num_kb = n_pad // block_k
    for kb in range(num_kb):  # static unroll: n_pad is compile-time
        k = k_ref[0, kb * block_k : (kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK] fp32
        lo = kb * block_k
        if has_mask:
            vrow = valid_ref[0, 0, lo : lo + block_k]  # [BK] lanes
            ok = jnp.broadcast_to(vrow[None, :] > 0.5, s.shape)
        elif lo + block_k > n_valid:
            # mask padded keys (compile-time bound; iota must be >= 2D on TPU)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + lo
            ok = col < n_valid
        else:
            ok = None
        if ok is not None:
            s = jnp.where(ok, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # [BQ, BK] fp32
        if ok is not None:
            p = jnp.where(ok, p, 0.0)  # exact 0 even if the block is all-pad
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # [BQ, 1]


def _flat_pad(x, B, H, N, Dh, target):
    x = x.reshape(B * H, N, Dh)
    if target > N:
        x = jnp.pad(x, ((0, 0), (0, target - N), (0, 0)))
    return x


def _valid_mask(kpad: jnp.ndarray, N: int, n_pad: int) -> jnp.ndarray:
    """[B, N] bool True=PAD -> [B, 1, n_pad] fp32 1=attendable (pad+length
    masking combined once on the host side of the kernel; the middle
    singleton keeps every BlockSpec trailing-dim TPU-tileable and the
    per-batch row is selected by the INDEX MAP, not an in-kernel dynamic
    load, which Mosaic does not support on the sublane dim)."""
    valid = jnp.logical_not(kpad).astype(jnp.float32)
    if n_pad > N:
        valid = jnp.pad(valid, ((0, 0), (0, n_pad - N)))
    return valid[:, None, :]


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kpad: jnp.ndarray | None = None,
                   interpret: bool | None = None):
    """Returns (out [B,H,N,Dh], lse [B*H, pad_q] fp32).

    kpad: optional [B, N] bool key-padding mask (True = PAD, torch
    MultiheadAttention semantics) shared across heads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _use_interpret()
    B, H, N, Dh = q.shape
    scale = 1.0 / (Dh**0.5)
    n_pad = -(-N // BLOCK_K) * BLOCK_K
    pad_q = -(-N // BLOCK_Q) * BLOCK_Q

    qf = _flat_pad(q, B, H, N, Dh, pad_q)
    kf = _flat_pad(k, B, H, N, Dh, n_pad)
    vf = _flat_pad(v, B, H, N, Dh, n_pad)

    has_mask = kpad is not None
    grid = (B * H, pad_q // BLOCK_Q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, n_valid=N, block_k=BLOCK_K,
        has_mask=has_mask,
    )
    in_specs = [
        pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if has_mask:
        # one [1, 1, n_pad] row per program; bh // H in the index map picks
        # the batch row (block-index arithmetic is free; in-kernel dynamic
        # sublane loads are not implemented by Mosaic)
        in_specs.append(
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(_valid_mask(kpad, N, n_pad))
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B * H, pad_q, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * H, pad_q, 1), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :N, :].reshape(B, H, N, Dh), lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _flash_bwd_dkdv_kernel(*refs, scale: float, n_valid: int,
                           block_q: int, has_mask: bool):
    """One K/V tile vs all Q tiles.

    q_ref, do_ref: [1, pad_q, Dh]; lse_ref, dd_ref: [1, pad_q, 1];
    valid_ref (only when has_mask): [1, 1, BK] fp32 key-validity for THIS
    K tile (batch row + tile picked by the index map);
    k_ref, v_ref, dk_ref, dv_ref: [1, BK, Dh].
    Padded-q rows have dO == 0, so their dK/dV contributions vanish.
    """
    from jax.experimental import pallas as pl

    if has_mask:
        (q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, valid_ref,
         dk_ref, dv_ref) = refs
    else:
        q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, dk_ref, dv_ref = refs
        valid_ref = None

    kb = k_ref[0]  # [BK, Dh] native dtype (bf16 MXU inputs, fp32 accum)
    vb = v_ref[0]
    pad_q = q_ref.shape[1]
    bk = kb.shape[0]
    dh = kb.shape[1]
    kv_start = pl.program_id(1) * bk  # global column offset of this K block

    dk = jnp.zeros((bk, dh), jnp.float32)
    dv = jnp.zeros((bk, dh), jnp.float32)

    num_qb = pad_q // block_q
    for qb in range(num_qb):
        qn = q_ref[0, qb * block_q : (qb + 1) * block_q, :]
        do = do_ref[0, qb * block_q : (qb + 1) * block_q, :]
        lse = lse_ref[0, qb * block_q : (qb + 1) * block_q, :]  # [BQ, 1]
        dd = dd_ref[0, qb * block_q : (qb + 1) * block_q, :]

        s = jax.lax.dot_general(
            qn, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK] fp32
        if has_mask:
            vrow = valid_ref[0, 0, :]  # this program's K tile, [BK] lanes
            ok = jnp.broadcast_to(vrow[None, :] > 0.5, s.shape)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
            ok = col < n_valid
        # lse of an all-masked row is the -1e30 sentinel; the where keeps
        # exp(s - lse) from turning those columns into garbage
        p = jnp.where(ok, jnp.exp(s - lse), 0.0)

        # dV += P^T dO
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (dP - D)
        dp = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dd)).astype(qn.dtype)
        # dK += dS^T q * scale (scale folded after the accumulation loop)
        dk = dk + jax.lax.dot_general(
            ds, qn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(*refs, scale: float, n_valid: int, block_k: int,
                         has_mask: bool):
    """One Q tile vs all K/V tiles.

    k_ref, v_ref: [1, n_pad, Dh]; valid_ref (only when has_mask):
    [1, 1, n_pad] fp32 key-validity (batch row picked by the index map); q_ref, do_ref, dq_ref: [1, BQ, Dh];
    lse_ref, dd_ref: [1, BQ, 1]."""
    if has_mask:
        k_ref, v_ref, do_ref, lse_ref, dd_ref, q_ref, valid_ref, dq_ref = refs
    else:
        k_ref, v_ref, do_ref, lse_ref, dd_ref, q_ref, dq_ref = refs
        valid_ref = None
    qn = q_ref[0]  # native dtype (bf16 MXU inputs, fp32 accum)
    do = do_ref[0]
    lse = lse_ref[0]  # [BQ, 1]
    dd = dd_ref[0]
    n_pad = k_ref.shape[1]
    bq = qn.shape[0]
    dh = qn.shape[1]

    dq = jnp.zeros((bq, dh), jnp.float32)
    num_kb = n_pad // block_k
    for kb_i in range(num_kb):
        kb = k_ref[0, kb_i * block_k : (kb_i + 1) * block_k, :]
        vb = v_ref[0, kb_i * block_k : (kb_i + 1) * block_k, :]
        s = jax.lax.dot_general(
            qn, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        lo = kb_i * block_k
        if has_mask:
            vrow = valid_ref[0, 0, lo : lo + block_k]  # [BK] lanes
            ok = jnp.broadcast_to(vrow[None, :] > 0.5, s.shape)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + lo
            ok = col < n_valid
        p = jnp.where(ok, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - dd)).astype(kb.dtype)
        dq = dq + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, kpad=None,
                    interpret: bool | None = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _use_interpret()
    B, H, N, Dh = q.shape
    scale = 1.0 / (Dh**0.5)
    n_pad = -(-N // BLOCK_K) * BLOCK_K
    pad_q = -(-N // BLOCK_Q) * BLOCK_Q

    qf = _flat_pad(q, B, H, N, Dh, pad_q)
    dof = _flat_pad(g, B, H, N, Dh, pad_q)  # zero dO at padded q rows
    kf = _flat_pad(k, B, H, N, Dh, n_pad)
    vf = _flat_pad(v, B, H, N, Dh, n_pad)
    has_mask = kpad is not None
    valid = _valid_mask(kpad, N, n_pad) if has_mask else None

    # D = rowsum(dO * O) — O(N*Dh) elementwise, fine in XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(B * H, N)
    if pad_q > N:
        delta = jnp.pad(delta, ((0, 0), (0, pad_q - N)))
    delta = delta[..., None]  # [BH, pad_q, 1] (TPU-tileable trailing dim)

    dkdv_kernel = functools.partial(
        _flash_bwd_dkdv_kernel, scale=scale, n_valid=N, block_q=BLOCK_Q,
        has_mask=has_mask,
    )
    dkdv_specs = [
        pl.BlockSpec((1, pad_q, Dh), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pad_q, Dh), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pad_q, 1), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pad_q, 1), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_K, Dh), lambda bh, ki: (bh, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_K, Dh), lambda bh, ki: (bh, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    dkdv_operands = [qf, dof, lse, delta, kf, vf]
    if has_mask:
        dkdv_specs.append(
            pl.BlockSpec((1, 1, BLOCK_K), lambda bh, ki: (bh // H, 0, ki),
                         memory_space=pltpu.VMEM))
        dkdv_operands.append(valid)
    dk, dv = pl.pallas_call(
        dkdv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad, Dh), q.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=(B * H, n_pad // BLOCK_K),
            in_specs=dkdv_specs,
            out_specs=(
                pl.BlockSpec((1, BLOCK_K, Dh), lambda bh, ki: (bh, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_K, Dh), lambda bh, ki: (bh, ki, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(*dkdv_operands)

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, n_valid=N, block_k=BLOCK_K,
        has_mask=has_mask,
    )
    dq_specs = [
        pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, Dh), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq_operands = [kf, vf, dof, lse, delta, qf]
    if has_mask:
        dq_specs.append(
            pl.BlockSpec((1, 1, n_pad), lambda bh, qi: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM))
        dq_operands.append(valid)
    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, pad_q, Dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B * H, pad_q // BLOCK_Q),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec((1, BLOCK_Q, Dh), lambda bh, qi: (bh, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*dq_operands)

    def unpad(x):
        return x[:, :N, :].reshape(B, H, N, Dh)

    return unpad(dq), unpad(dk), unpad(dv)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _flash_plain(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_forward(q, k, v)[0]


def _fwd(q, k, v):
    out, lse = _flash_forward(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g)


_flash_plain.defvjp(_fwd, _bwd)


@jax.custom_vjp
def _flash_masked(q, k, v, kpad_f: jnp.ndarray) -> jnp.ndarray:
    # kpad_f: [B, N] fp32, 1.0 = PAD (float so custom_vjp can hand back a
    # well-typed zero cotangent; the kernels consume it as a validity mask)
    return _flash_forward(q, k, v, kpad_f > 0.5)[0]


def _fwd_masked(q, k, v, kpad_f):
    kpad = kpad_f > 0.5
    out, lse = _flash_forward(q, k, v, kpad)
    return out, (q, k, v, out, lse, kpad_f)


def _bwd_masked(res, g):
    q, k, v, out, lse, kpad_f = res
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, kpad_f > 0.5)
    return dq, dk, dv, jnp.zeros_like(kpad_f)


_flash_masked.defvjp(_fwd_masked, _bwd_masked)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, H, N, Dh] x3 -> [B, H, N, Dh]; softmax stats in fp32.

    key_padding_mask: optional [B, N] bool, True = PAD (torch
    MultiheadAttention semantics, shared across heads) — masked INSIDE the
    kernels, so the N x N bias tensor of the XLA path is never materialized.

    Degenerate case — a query row whose keys are ALL masked: this kernel
    returns exactly 0 for that row (sum of weights clamped to 1e-30),
    whereas an additive-bias XLA fallback would return uniform attention
    over the padded keys (a finite bias cancels in softmax).  Zero is the
    defensible answer (no valid key to attend to) and no caller produces a
    fully-masked row (collate guarantees >= 1 valid token per modality);
    anyone adding such a caller must not rely on the fallback's behavior.
    """
    if key_padding_mask is None:
        return _flash_plain(q, k, v)
    return _flash_masked(q, k, v, key_padding_mask.astype(jnp.float32))


def flash_attention_interpret(q, k, v, key_padding_mask=None):
    """Interpreter-mode entry for CPU tests of the kernel logic."""
    return _flash_forward(q, k, v, key_padding_mask, interpret=True)[0]
