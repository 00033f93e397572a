"""Pipeline parallelism: GPipe-style SPMD pipeline over a 'pipe' mesh axis
(parallel/pipeline.py).  Completes the dp/tp/sp/pp matrix."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_diffusion_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params, unstack_stage_params,
)


@pytest.fixture(scope="module")
def pipe_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("pipe",))


def _make_stages(n_stages, d=32, layers_per_stage=2, seed=0):
    """Each stage = layers_per_stage MMDiT blocks (the real payload)."""
    import flax.linen as nn

    from multimodal_diffusion_tpu.models.mmdit import Block

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(layers_per_stage):
                x = Block(n_heads=4, mlp_ratio=2.0, dropout=0.0,
                          attn_dropout=0.0, norm="rmsnorm", rope=False,
                          name=f"block_{i}")(x)
            return x

    stage = Stage()
    x0 = jnp.zeros((1, 8, d), jnp.float32)
    per_stage = [
        stage.init({"params": jax.random.PRNGKey(seed + i)}, x0)["params"]
        for i in range(n_stages)
    ]
    def stage_fn(params, x):
        return stage.apply({"params": params}, x)

    return stage_fn, per_stage


@pytest.mark.slow
def test_pipeline_matches_sequential(pipe_mesh):
    stage_fn, per_stage = _make_stages(4)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 32), jnp.float32)

    y_seq = x
    for p in per_stage:
        y_seq = stage_fn(p, y_seq)

    y_pipe = jax.jit(
        lambda sp, xx: pipeline_apply(stage_fn, sp, xx, pipe_mesh,
                                      n_microbatches=4)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pipeline_grad_matches_sequential(pipe_mesh):
    stage_fn, per_stage = _make_stages(4)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 32), jnp.float32)

    def loss_seq(stages):
        y = x
        for p in unstack_stage_params(stages, 4):
            y = stage_fn(p, y)
        return jnp.sum(y ** 2)

    def loss_pipe(stages):
        return jnp.sum(
            pipeline_apply(stage_fn, stages, x, pipe_mesh,
                           n_microbatches=2) ** 2)

    g_seq = jax.grad(loss_seq)(stacked)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pipe),
        jax.tree_util.tree_leaves_with_path(g_seq),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(kp))


def test_pipeline_rejects_bad_microbatching(pipe_mesh):
    stage_fn, per_stage = _make_stages(4)
    stacked = stack_stage_params(per_stage)
    x = jnp.zeros((6, 8, 32), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(stage_fn, stacked, x, pipe_mesh, n_microbatches=4)


@pytest.mark.slow
def test_mmdit_pipeline_apply_matches_core(pipe_mesh):
    """Pipelined apply of an ORDINARY MMDiT checkpoint param tree == the
    plain core forward (8 layers -> 4 stages x 2 blocks)."""
    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from multimodal_diffusion_tpu.parallel.pipeline import mmdit_pipeline_apply

    cfg = MMDiTConfig(d_model=32, n_layers=8, n_heads=4, mlp_ratio=2.0,
                      dropout=0.0, attn_dropout=0.0, norm="rmsnorm")
    core = MMDiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 32), jnp.float32)
    params = core.init({"params": jax.random.PRNGKey(6)}, x)["params"]

    y_ref = core.apply({"params": params}, x)
    y_pipe = jax.jit(
        lambda p, xx: mmdit_pipeline_apply(cfg, p, xx, pipe_mesh,
                                           n_microbatches=4)
    )(params, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_mmdit_pipeline_apply_masked_matches_core(pipe_mesh):
    """Key-padding masks pipeline too: each stage indexes its microbatch's
    mask from the replicated table (the mask never hops the ring).  Ragged
    per-sample masks across microbatch boundaries must equal the plain
    masked core forward."""
    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from multimodal_diffusion_tpu.parallel.pipeline import mmdit_pipeline_apply

    cfg = MMDiTConfig(d_model=32, n_layers=8, n_heads=4, mlp_ratio=2.0,
                      dropout=0.0, attn_dropout=0.0, norm="rmsnorm")
    core = MMDiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 16, 32), jnp.float32)
    params = core.init({"params": jax.random.PRNGKey(8)}, x)["params"]

    mask = np.zeros((8, 16), bool)
    for b in range(8):           # different pad length per sample
        mask[b, 16 - (b % 5):] = True
    mask = jnp.asarray(mask)

    y_ref = core.apply({"params": params}, x, mask)
    y_pipe = jax.jit(
        lambda p, xx, mm: mmdit_pipeline_apply(cfg, p, xx, pipe_mesh,
                                               n_microbatches=4,
                                               key_padding_mask=mm)
    )(params, x, mask)
    # padded positions may differ (they attend to nothing); compare the
    # real tokens only
    keep = ~np.asarray(mask)
    np.testing.assert_allclose(np.asarray(y_pipe)[keep],
                               np.asarray(y_ref)[keep],
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_mmdit_core_pipelined_path_carries_mask():
    """The config-integrated pipe path (MMDiT with a pipe mesh) accepts
    key-padding masks end-to-end and matches the unpipelined core."""
    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from multimodal_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=1, pipe=2, devices=jax.devices()[:4])
    cfg_pipe = MMDiTConfig(d_model=32, n_layers=4, n_heads=4, mlp_ratio=2.0,
                           dropout=0.0, attn_dropout=0.0, norm="rmsnorm",
                           mesh=mesh, pipe_axis="pipe", pipe_microbatches=2)
    cfg_flat = MMDiTConfig(d_model=32, n_layers=4, n_heads=4, mlp_ratio=2.0,
                           dropout=0.0, attn_dropout=0.0, norm="rmsnorm")
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 12, 32), jnp.float32)
    mask = np.zeros((4, 12), bool)
    mask[0, 9:] = True
    mask[3, 5:] = True
    mask = jnp.asarray(mask)

    m_pipe, m_flat = MMDiT(cfg_pipe), MMDiT(cfg_flat)
    params = m_flat.init({"params": jax.random.PRNGKey(10)}, x)["params"]
    y_flat = m_flat.apply({"params": params}, x, mask)
    y_pipe = m_pipe.apply({"params": params}, x, mask)
    keep = ~np.asarray(mask)
    np.testing.assert_allclose(np.asarray(y_pipe)[keep],
                               np.asarray(y_flat)[keep],
                               atol=2e-5, rtol=2e-5)
