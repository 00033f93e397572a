"""Pipeline parallelism — GPipe-style SPMD pipelining over a mesh axis.

Completes the dp/tp/sp/pp matrix (SURVEY §2.B: the reference has DP only;
VERDICT r1 row 33 tracked PP as absent).  Not needed at mvp scale, but the
primitive is what larger cores shard layers with when a stage no longer
fits one chip's HBM.

Design (scaling-book recipe, all-SPMD):
  * layer parameters are STACKED along a leading `n_stages` axis that is
    sharded over the mesh's pipe axis — each device holds one stage's
    weights;
  * the batch is split into M microbatches; the shard_map body runs
    M + P - 1 ticks; every tick, activations hop one stage down the ring
    via `lax.ppermute` while each device applies its stage to the
    microbatch currently resident (bubble ticks compute garbage that is
    masked out — branchless SPMD, no data-dependent control flow);
  * the last stage's outputs are psum-broadcast (masked) so the result is
    replicated over the pipe axis; autodiff through ppermute/scan yields
    the reverse pipeline for the backward pass automatically.

`stack_stage_params` / `unstack_stage_params` convert between a list of
per-stage pytrees and the stacked layout.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def stack_stage_params(stage_params: List[Any]) -> Any:
    """[P x pytree] -> one pytree with a leading n_stages axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *stage_params
    )


def unstack_stage_params(stacked: Any, n_stages: int) -> List[Any]:
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(n_stages)
    ]


def _pipeline_local(stage_params, x_micro, *rest, stage_fn, n_stages: int,
                    axis: str):
    """Per-device body.  stage_params: this stage's weights (leading axis
    already consumed by shard_map -> [1, ...]); x_micro: [M, b, ...]
    microbatches (replicated).  Optional trailing arg: mask_micro
    [M, b, N] key-padding masks — the mask does NOT hop the ring (it is
    globally known): the stage at position p processes microbatch (t - p)
    at tick t, so it indexes the mask table directly, and stage_fn is
    called as stage_fn(params, h, mask)."""
    mask_micro = rest[0] if rest else None
    p = jax.lax.axis_index(axis)
    M = x_micro.shape[0]
    params = jax.tree_util.tree_map(lambda t: t[0], stage_params)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    # carries must be 'varying over the pipe axis' from tick 0 (ppermute
    # outputs are varying; shard_map's scan typing rejects a mix) — adding
    # 0 * axis_index marks them varying without changing values
    vary = 0.0 * p.astype(x_micro.dtype)
    buf0 = jnp.zeros_like(x_micro[0]) + vary
    out_buf0 = jnp.zeros_like(x_micro) + vary

    def tick(carry, t):
        prev_out, out_buf = carry
        # activations hop one stage down the ring
        incoming = jax.lax.ppermute(prev_out, axis, perm)
        # stage 0 feeds microbatch t (clamped index; bubble ticks masked)
        mb = x_micro[jnp.clip(t, 0, M - 1)]
        cur = jnp.where(p == 0, mb, incoming)
        if mask_micro is None:
            out = stage_fn(params, cur)
        else:
            out = stage_fn(params, cur,
                           mask_micro[jnp.clip(t - p, 0, M - 1)])
        # live iff this device is processing a real microbatch: 0 <= t-p < M
        live = jnp.logical_and(t - p >= 0, t - p < M)
        out = jnp.where(live, out, 0.0)
        # last stage stores its finished microbatch t - (P-1)
        is_last = p == n_stages - 1
        slot = jnp.clip(t - (n_stages - 1), 0, M - 1)
        store = jnp.logical_and(is_last, t - (n_stages - 1) >= 0)
        upd = jnp.where(store, out, out_buf[slot])
        out_buf = jax.lax.dynamic_update_index_in_dim(out_buf, upd, slot, 0)
        return (out, out_buf), None

    (_, out_buf), _ = jax.lax.scan(
        tick, (buf0, out_buf0), jnp.arange(M + n_stages - 1)
    )
    # replicate the last stage's results over the pipe axis
    mask = (p == n_stages - 1).astype(out_buf.dtype)
    return jax.lax.psum(out_buf * mask, axis)


def pipeline_apply(
    stage_fn: Callable[..., jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int = 4,
    key_padding_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run `x` [B, ...] through `n_stages` pipelined stages.

    stage_fn(params_i, microbatch) -> microbatch (same shape); shapes must
    be stage-invariant (true for transformer blocks).  B must divide by
    n_microbatches.  Differentiable end-to-end.

    key_padding_mask [B, N] bool (True = PAD): each stage indexes the
    microbatch it is processing out of the replicated mask table (the mask
    never hops the ring), and stage_fn is called as
    stage_fn(params_i, microbatch, mask_microbatch)."""
    n_stages = mesh.shape[axis]
    B = x.shape[0]
    if B % n_microbatches:
        raise ValueError(f"batch {B} not divisible by {n_microbatches}")
    mb = B // n_microbatches
    x_micro = x.reshape((n_microbatches, mb) + x.shape[1:])

    params_spec = jax.tree_util.tree_map(
        lambda _: P(axis), stacked_params
    )
    # compose with data parallelism: each data-row pipelines its own batch
    # shard (keeping the within-microbatch batch dim sharded over 'data'
    # avoids an all-gather at the shard_map boundary)
    batch_sub = "data" if "data" in mesh.shape and mb % mesh.shape["data"] == 0 \
        else None
    x_spec = P(None, batch_sub)
    in_specs = [params_spec, x_spec]
    operands = [stacked_params, x_micro]
    if key_padding_mask is not None:
        if key_padding_mask.shape[0] != B:
            raise ValueError(
                f"key_padding_mask batch {key_padding_mask.shape[0]} != {B}")
        operands.append(key_padding_mask.reshape(
            (n_microbatches, mb) + key_padding_mask.shape[1:]))
        in_specs.append(P(None, batch_sub))
    fn = shard_map(
        functools.partial(_pipeline_local, stage_fn=stage_fn,
                          n_stages=n_stages, axis=axis),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=x_spec,
    )
    out = fn(*operands)
    return out.reshape((B,) + out.shape[2:])


# ---------------------------------------------------------------------------
# MMDiT integration: pipeline an existing (unstacked) core param tree
# ---------------------------------------------------------------------------


def mmdit_pipeline_apply(
    core_cfg,
    core_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int = 4,
    key_padding_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Checkpoint-compatible pipelined MMDiT forward.

    Takes the ordinary MMDiT param tree ({block_i}, final norm) produced by
    training/porting, splits the blocks into `mesh.shape[axis]` contiguous
    stages, stacks each stage's params, and runs the GPipe schedule; the
    final norm is applied outside the pipeline (replicated, token-local).
    Deterministic mode only (inference / eval)."""
    import flax.linen as nn

    from ..models.mmdit import Block, make_norm

    n_stages = mesh.shape[axis]
    if core_cfg.n_layers % n_stages:
        raise ValueError(
            f"{core_cfg.n_layers} layers not divisible into {n_stages} stages")
    k = core_cfg.n_layers // n_stages

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, h, mask=None):
            for i in range(k):
                h = Block(core_cfg.n_heads, core_cfg.mlp_ratio,
                          core_cfg.dropout, core_cfg.attn_dropout,
                          core_cfg.norm, core_cfg.rope, core_cfg.gelu_exact,
                          dtype=core_cfg.dtype, name=f"block_{i}")(h, mask)
            return h

    stage = Stage()

    per_stage = []
    for s in range(n_stages):
        per_stage.append({
            f"block_{i}": core_params[f"block_{s * k + i}"] for i in range(k)
        })
    stacked = stack_stage_params(per_stage)

    if key_padding_mask is None:
        def stage_fn(p, h):
            return stage.apply({"params": p}, h)
    else:
        def stage_fn(p, h, m):
            return stage.apply({"params": p}, h, m)

    h = pipeline_apply(stage_fn, stacked, x.astype(core_cfg.dtype), mesh,
                       axis=axis, n_microbatches=n_microbatches,
                       key_padding_mask=key_padding_mask)

    # final norm: params live under the norm module's name in core_params
    norm = make_norm(core_cfg.norm, core_cfg.dtype)
    norm_params = {kk: v for kk, v in core_params.items()
                   if not kk.startswith("block_")}
    if len(norm_params) != 1:
        raise ValueError(f"expected one final-norm entry, got "
                         f"{list(norm_params)}")
    ((_, np_tree),) = norm_params.items()
    return norm.apply({"params": np_tree}, h)
