"""int8 (W8A8 dynamic) inference quantization: `model.core.quant: "int8"`.

The reference has no quantization anywhere; this is the TPU-native
int8-MXU extension (ops/quant.py).  Contract under test:

  * the quantized dot is a drop-in for nn.Dense's dot_general with bounded
    error on gaussian data,
  * a quantized MMDiT's deterministic forward tracks the fp32 model,
  * training passes (deterministic=False) are EXACTLY the unquantized
    program — same outputs, same gradients,
  * config plumbing reaches the core through model.core.quant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from multimodal_diffusion_tpu.ops.quant import (
    int8_dot_general, quantize_rowwise,
)


def test_quantize_rowwise_roundtrip_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    q, s = quantize_rowwise(x, axis=-1)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    # absmax symmetric quant: per-element error <= scale/2 = absmax/254
    bound = np.broadcast_to(
        np.abs(np.asarray(x)).max(axis=-1, keepdims=True) / 254.0 + 1e-7,
        x.shape)
    np.testing.assert_array_less(np.abs(np.asarray(back - x)), bound)


def test_int8_dot_general_matches_fp32():
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k0, (256, 128), jnp.float32)
    w = jax.random.normal(k1, (128, 192), jnp.float32) / np.sqrt(128)
    ref = x @ w
    got = int8_dot_general(x, w, (((1,), (0,)), ((), ())))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_int8_dot_general_rejects_non_dense_pattern():
    x = jnp.zeros((4, 8, 8))
    with pytest.raises(NotImplementedError):
        int8_dot_general(x, x, (((0,), (0,)), ((), ())))


def _cfg(**kw):
    base = dict(d_model=64, n_layers=2, n_heads=4, mlp_ratio=2.0,
                dropout=0.0, attn_dropout=0.0, norm="rmsnorm",
                token_dropout=0.0)
    base.update(kw)
    return MMDiTConfig(**base)


@pytest.mark.slow
def test_mmdit_int8_inference_tracks_fp32():
    ref = MMDiT(_cfg())
    q = MMDiT(_cfg(quant="int8"))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 64), jnp.float32)
    params = ref.init({"params": jax.random.PRNGKey(3)}, x)["params"]
    out_ref = ref.apply({"params": params}, x, deterministic=True)
    out_q = q.apply({"params": params}, x, deterministic=True)
    rel = float(jnp.linalg.norm(out_q - out_ref)
                / jnp.linalg.norm(out_ref))
    assert rel < 5e-2, rel
    assert not np.allclose(np.asarray(out_q), np.asarray(out_ref))


@pytest.mark.slow
def test_mmdit_int8_training_pass_is_exactly_unquantized():
    """deterministic=False (the training configuration) must be the SAME
    program with and without quant: outputs and grads bitwise equal."""
    ref = MMDiT(_cfg())
    q = MMDiT(_cfg(quant="int8"))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 64), jnp.float32)
    params = ref.init({"params": jax.random.PRNGKey(5)}, x)["params"]
    rngs = {"dropout": jax.random.PRNGKey(6)}

    out_ref = ref.apply({"params": params}, x, deterministic=False,
                        rngs=rngs)
    out_q = q.apply({"params": params}, x, deterministic=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_ref))

    def loss(model):
        def f(p):
            return jnp.sum(model.apply({"params": p}, x,
                                       deterministic=False, rngs=rngs) ** 2)
        return f

    g_ref = jax.grad(loss(ref))(params)
    g_q = jax.grad(loss(q))(params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_q),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(kp))


def test_mmdit_rejects_unknown_quant():
    m = MMDiT(_cfg(quant="fp4"))
    x = jnp.zeros((1, 8, 64))
    with pytest.raises(ValueError, match="quant"):
        m.init({"params": jax.random.PRNGKey(0)}, x,
               deterministic=True)


def test_config_plumbs_quant_to_core():
    from multimodal_diffusion_tpu.models.diffusion import AVDiffusionConfig
    from tests._tiny import tiny_cfg

    cfg = tiny_cfg()
    cfg["model"]["core"]["quant"] = "int8"
    mc = AVDiffusionConfig.from_config(cfg)
    assert mc.core.quant == "int8"
