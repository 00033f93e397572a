"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the reference has ZERO distributed tests — SURVEY §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.parallel.mesh import LOGICAL_RULES, make_mesh
from multimodal_diffusion_tpu.parallel.sharding import (
    batch_sharding, infer_param_shardings, shard_batch,
)


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh(data=-1, model=1)
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(data=4, model=2)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = make_mesh(data=2, model=2)  # subset of devices is allowed
    assert m3.shape == {"data": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=8, model=2)  # 16 > 8


def test_shard_batch_splits_leading_axis():
    mesh = make_mesh(data=4, model=2)
    batch = shard_batch(mesh, {"x": np.zeros((8, 3)), "flag": np.ones(8, bool)})
    x = batch["x"]
    assert x.sharding.spec == jax.sharding.PartitionSpec("data", None)
    # each data-shard holds 8/4 = 2 rows
    assert x.addressable_shards[0].data.shape == (2, 3)


def test_param_shardings_tp_axes():
    """MMDiT qkv/mlp kernels must land on the 'model' axis."""
    import flax.linen as nn

    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    mesh = make_mesh(data=4, model=2)
    m = MMDiT(MMDiTConfig(d_model=64, n_layers=1, n_heads=4, dropout=0.0))
    x = jnp.zeros((1, 8, 64))
    boxed = m.init(jax.random.PRNGKey(0), x)["params"]
    shardings = infer_param_shardings(mesh, boxed)
    qkv = shardings["block_0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, "model")
    fc1 = shardings["block_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, "model")
    out = shardings["block_0"]["attn"]["out"]["kernel"]
    assert out.spec == jax.sharding.PartitionSpec("model", None)


def test_dp_grad_equivalence():
    """Data-parallel mean-loss grads over 8 devices == single-device grads
    on the same global batch (the DDP-allreduce correctness property)."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(nn.tanh(nn.Dense(16)(x)))

    model = Tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, xb, yb):
        return jnp.mean((model.apply(p, xb) - yb) ** 2)

    g_single = jax.grad(loss_fn)(params, x, y)

    mesh = make_mesh(data=8, model=1)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    ys = jax.device_put(y, batch_sharding(mesh, 2))
    ps = jax.device_put(params, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    g_sharded = jax.jit(jax.grad(loss_fn))(ps, xs, ys)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_graft_entry_single():
    """entry() must produce a jittable forward on the flagship model."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_v, out_a = jax.jit(fn)(*args)
    assert out_v.shape == (1, 8, 12, 16, 16)
    assert out_a.shape == (1, 8, 150)
    assert np.isfinite(np.asarray(out_v, np.float32)).all()


@pytest.mark.slow
def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
