"""Ring attention — context/sequence-parallel attention over a mesh axis.

The reference handles long time horizons purely algorithmically (sliding
windows + crossfade, SURVEY §2.B); this op adds true sequence scaling: the
sequence is SHARDED across devices and never materialized whole.  Each device
keeps its local Q shard and passes its K/V shard around the ring with
`lax.ppermute` (XLA lowers this to ICI neighbor exchanges), folding each
incoming block into flash-style online-softmax statistics — memory per device
is O(N / n_devices * Dh) and the K/V transfer overlaps compute in XLA's
pipeline.

Usage (N must divide by the axis size):

    out = ring_attention_sharded(q, k, v, mesh, axis="model")

which shard_maps `_ring_attention_local` with qkv partitioned
P(None, None, axis, None).  Verified against single-device attention in
tests/test_ring_attention.py on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          kv_valid: jnp.ndarray, *, axis: str) -> jnp.ndarray:
    """Per-device body (inside shard_map): q, k, v are LOCAL sequence shards
    [B, H, Nl, Dh]; kv_valid is the local key-validity shard [B, Nl]
    (True = real token) and circles the ring WITH its K/V block, so padded
    keys are excluded no matter which device currently holds them.  Returns
    the local output shard.  A query row whose keys are ALL invalid returns
    zeros — the same degenerate-case contract as ops/flash_attention.py."""
    n_dev = jax.lax.psum(1, axis)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    qf = q.astype(jnp.float32) * scale

    # derive carries from qf so they inherit the 'varying over axis' type
    # shard_map tracks (a fresh jnp.zeros would be unvarying -> scan carry
    # type mismatch)
    zero_col = qf[..., :1] * 0.0
    m0 = zero_col - jnp.inf
    l0 = zero_col
    acc0 = qf * 0.0

    # ring: each step folds the current K/V block, then passes it to the
    # next device (ppermute source i -> dest (i+1) % n)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(carry, _):
        k_cur, v_cur, valid_cur, m, l, acc = carry
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        # mask with a large-finite fill (not -inf: when every key seen so
        # far is masked, m_new would be -inf and exp(s - m_new) would NaN);
        # the explicit `p * valid` below is what actually zeroes the
        # contribution, the fill only keeps running-max statistics sane
        vb = valid_cur[:, None, None, :]  # [B, 1, 1, M]
        s = jnp.where(vb, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new) * vb
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhnm,bhmd->bhnd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        valid_nxt = jax.lax.ppermute(valid_cur, axis, perm)
        return (k_nxt, v_nxt, valid_nxt, m_new, l, acc), None

    (_, _, _, m, l, acc), _ = jax.lax.scan(
        body, (k, v, kv_valid, m0, l0, acc0), None, length=n_dev
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def _ring_flash_fwd_core(q, k, v, valid_f, *, axis: str):
    """Flash-kernel ring forward: each ring step runs the Pallas flash
    forward on the CURRENT K/V block (O(BLOCK_Q x BLOCK_K) VMEM working set
    — the [Nl x Nl] score matrix of the einsum body is never materialized)
    and the per-block normalized outputs are merged with log-sum-exp
    algebra:

        out = sum_i exp(lse_i - lse_total) * out_i,
        lse_total = logsumexp_i(lse_i)

    which is exact because flash returns out_i = acc_i / l_i together with
    lse_i = m_i + log(l_i).  A fully-masked block yields lse_i ~ -1e30 and
    weight ~0, preserving the zeros contract.

    valid_f: [B, Nl] float32 key-validity (1.0 = real token; float so the
    custom_vjp can hand back a zero cotangent, same trick as
    flash_attention._flash_masked).  Returns (out [B,H,Nl,Dh],
    lse_total [B,H,Nl,1] fp32 in scaled-score space — the statistic the
    ring backward replays blocks against)."""
    from .flash_attention import _flash_forward

    n_dev = jax.lax.psum(1, axis)
    B, H, Nl, Dh = q.shape
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    zero_col = (q[..., :1] * 0.0).astype(jnp.float32)
    lse0 = zero_col - jnp.inf          # [B, H, Nl, 1]
    acc0 = q.astype(jnp.float32) * 0.0

    def body(carry, _):
        k_cur, v_cur, valid_cur, lse, acc = carry
        out_i, lse_flat = _flash_forward(q, k_cur, v_cur,
                                         kpad=valid_cur < 0.5)
        lse_i = lse_flat[:, :Nl, :].reshape(B, H, Nl, 1)
        lse_new = jnp.logaddexp(lse, lse_i)
        # exp(-inf - -inf) guard: a row with no valid keys anywhere keeps
        # lse_new == -inf; weights become 0 via the where
        w_old = jnp.where(jnp.isneginf(lse_new), 0.0, jnp.exp(lse - lse_new))
        w_new = jnp.where(jnp.isneginf(lse_new), 0.0,
                          jnp.exp(lse_i - lse_new))
        acc = acc * w_old + out_i.astype(jnp.float32) * w_new
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        valid_nxt = jax.lax.ppermute(valid_cur, axis, perm)
        return (k_nxt, v_nxt, valid_nxt, lse_new, acc), None

    (_, _, _, lse, acc), _ = jax.lax.scan(
        body, (k, v, valid_f, lse0, acc0), None, length=n_dev
    )
    return acc.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ring_attention_local_flash(q, k, v, valid_f, axis: str):
    """Differentiable flash-backed ring body (per device, inside shard_map).

    Backward is the standard ring-flash scheme (RingAttention /
    flash-attention-2 backward with GLOBAL statistics): the forward saves
    the merged lse_total; the backward replays the K/V ring, calling the
    Pallas flash backward kernels per block with the global lse and
    delta = rowsum(dO * O) — which are exactly the inputs those kernels
    already take — accumulating dq locally while each block's dk/dv
    cotangents ride the ring home with their block.  Peak memory stays
    O(Nl * Dh) per device; no [Nl x Nl] score matrix is ever formed in
    either direction."""
    out, _ = _ring_flash_fwd_core(q, k, v, valid_f, axis=axis)
    return out


def _ring_flash_vjp_fwd(q, k, v, valid_f, axis: str):
    out, lse = _ring_flash_fwd_core(q, k, v, valid_f, axis=axis)
    return out, (q, k, v, valid_f, out, lse)


def _ring_flash_vjp_bwd(axis: str, res, g):
    from .flash_attention import _flash_backward

    q, k, v, valid_f, out, lse = res
    B, H, Nl, Dh = q.shape
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    # the flash bwd kernels take lse in the forward's flat padded layout
    # [B*H, pad_q, 1]; padded rows are harmless there (their dO rows are
    # zero-padded inside _flash_backward, so their contributions vanish)
    block_q = 128  # flash_attention.BLOCK_Q
    pad_q = -(-Nl // block_q) * block_q
    lse_flat = lse.reshape(B * H, Nl, 1)
    if pad_q > Nl:
        lse_flat = jnp.pad(lse_flat, ((0, 0), (0, pad_q - Nl), (0, 0)))

    dq0 = jnp.zeros_like(q, jnp.float32)
    dk0 = jnp.zeros_like(k, jnp.float32)
    dv0 = jnp.zeros_like(v, jnp.float32)

    def body(carry, _):
        k_cur, v_cur, valid_cur, dk_acc, dv_acc, dq_acc = carry
        dq_i, dk_i, dv_i = _flash_backward(
            q, k_cur, v_cur, out, lse_flat, g, kpad=valid_cur < 0.5)
        dq_acc = dq_acc + dq_i.astype(jnp.float32)
        dk_acc = dk_acc + dk_i.astype(jnp.float32)
        dv_acc = dv_acc + dv_i.astype(jnp.float32)
        # dk/dv cotangents travel WITH their K/V block: after n_dev hops
        # each block (and its accumulated gradient) is back home having
        # collected every device's query contributions
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        valid_nxt = jax.lax.ppermute(valid_cur, axis, perm)
        dk_nxt = jax.lax.ppermute(dk_acc, axis, perm)
        dv_nxt = jax.lax.ppermute(dv_acc, axis, perm)
        return (k_nxt, v_nxt, valid_nxt, dk_nxt, dv_nxt, dq_acc), None

    (k_fin, _, _, dk, dv, dq), _ = jax.lax.scan(
        body, (k, v, valid_f, dk0, dv0, dq0), None, length=n_dev
    )
    del k_fin
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(valid_f))


_ring_attention_local_flash.defvjp(_ring_flash_vjp_fwd, _ring_flash_vjp_bwd)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: str = "auto",
    head_axis: str = "auto",
    kv_valid: jnp.ndarray = None,
    impl: str = "einsum",
) -> jnp.ndarray:
    """Sequence-parallel attention: [B, H, N, Dh] with N sharded over `axis`.

    N must be divisible by the axis size.  On a multi-axis mesh the batch and
    head dims are partitioned over `batch_axis` / `head_axis` too (the ring
    only communicates over `axis`); "auto" picks 'data'/'model' when those
    axes exist, divide the dim, and differ from `axis` — without this, a
    batch sharded over 'data' would be all-gathered at the shard_map
    boundary.

    kv_valid [B, N] bool (True = real key) enables key-padding masking:
    the validity shard travels the ring with its K/V block.  None means all
    keys attendable.

    impl: "einsum" (materializes one [B, H, Nl, Nl] score block per ring
    step) or "flash" (Pallas flash kernel per block merged by LSE algebra
    — O(block) memory in BOTH directions: the backward replays the ring
    against the flash bwd kernels with global lse/delta).  Both
    differentiable."""
    n_dev = mesh.shape[axis]
    if q.shape[2] % n_dev:
        raise ValueError(f"sequence {q.shape[2]} not divisible by {axis}={n_dev}")
    if kv_valid is None:
        kv_valid = jnp.ones((q.shape[0], q.shape[2]), bool)
    if kv_valid.shape != (q.shape[0], q.shape[2]):
        raise ValueError(
            f"kv_valid shape {kv_valid.shape} != (B, N) = "
            f"{(q.shape[0], q.shape[2])}")

    def pick(pref: str, dim: int):
        if pref != "auto":
            return pref
        for cand in ("data",) if dim == 0 else ("model",):
            if (cand in mesh.axis_names and cand != axis
                    and q.shape[dim] % mesh.shape[cand] == 0):
                return cand
        return None

    if impl not in {"einsum", "flash"}:
        raise ValueError(f"impl must be einsum|flash, got {impl!r}")
    if impl == "flash":
        # axis must be positional (custom_vjp nondiff arg); validity goes
        # float so the vjp can return a zero cotangent for it
        def local(q_, k_, v_, valid_):
            return _ring_attention_local_flash(
                q_, k_, v_, valid_.astype(jnp.float32), axis)
    else:
        local = functools.partial(_ring_attention_local, axis=axis)
    b_ax = pick(batch_axis, 0)
    spec = P(b_ax, pick(head_axis, 1), axis, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(b_ax, axis)),
        out_specs=spec,
        # pallas_call's out ShapeDtypeStructs carry no vma annotation, so
        # jax's varying-mesh-axes check cannot see through the flash body;
        # the einsum body keeps the check on
        check_vma=(impl != "flash"),
    )
    return fn(q, k, v, kv_valid)
