"""Flash-attention kernel correctness vs the XLA reference path
(interpreter mode on CPU; the kernel itself targets TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.ops.attention import mha_reference
from multimodal_diffusion_tpu.ops.flash_attention import (
    flash_attention_interpret,
)


@pytest.mark.parametrize("shape", [
    (1, 2, 128, 64),   # exact tile
    (2, 2, 133, 64),   # mvp token count: padded tail must be masked
    (1, 1, 384, 32),   # multiple K blocks
])
def test_flash_matches_reference(shape):
    B, H, N, Dh = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    out_ref = mha_reference(q, k, v)
    out_flash = flash_attention_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_io():
    shape = (1, 2, 130, 64)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(ki, shape, jnp.bfloat16) for ki in ks)
    out = flash_attention_interpret(q, k, v)
    ref = mha_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("shape", [
    (1, 2, 128, 64),   # exact tile
    (2, 1, 133, 32),   # padded tail: masked keys + zero-dO padded queries
    (1, 1, 384, 32),   # multiple K and Q blocks
])
def test_flash_pallas_backward_matches_reference(shape):
    """The blockwise Pallas backward (dq/dk/dv from recomputed probabilities
    + saved logsumexp) == autodiff through the XLA reference path."""
    from multimodal_diffusion_tpu.ops.flash_attention import flash_attention

    B, H, N, Dh = shape
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_flash_backward_is_memory_linear():
    """At N=8192 the grad computation must never materialize an N x N
    tensor (round-1's backward recomputed through the O(N^2) XLA path)."""
    from multimodal_diffusion_tpu.ops.flash_attention import flash_attention

    shape = (1, 1, 8192, 64)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v))

    args = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 3
    hlo = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(*args).as_text()
    assert "8192x8192" not in hlo and "8192,8192" not in hlo

    # the reference path DOES contain it — proves the probe detects N^2
    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v))

    hlo_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2))).lower(*args).as_text()
    assert "8192x8192" in hlo_ref or "8192,8192" in hlo_ref


@pytest.mark.parametrize("shape", [
    (2, 2, 133, 64),    # mvp tokens + padded tail
    (2, 2, 1101, 64),   # t2i-512 shape: 77 text + 1024 image tokens
])
def test_flash_key_padding_mask_matches_reference(shape):
    """In-kernel key-padding masking == additive-bias XLA path (this is the
    path the t2i-512 sampler takes: text PAD keys masked, image keys valid)."""
    from multimodal_diffusion_tpu.ops.attention import padding_bias

    B, H, N, Dh = shape
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    # mask a text-like prefix region differently per batch row (row 0 also
    # blanks a full 128-key block to exercise the all-masked-block guard)
    kpad = np.zeros((B, N), bool)
    kpad[0, :128] = True
    kpad[1:, 5:40] = True
    kpad = jnp.asarray(kpad)

    out_ref = mha_reference(q, k, v, padding_bias(kpad, H))
    out_flash = flash_attention_interpret(q, k, v, kpad)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_flash_key_padding_mask_backward():
    from multimodal_diffusion_tpu.ops.attention import padding_bias
    from multimodal_diffusion_tpu.ops.flash_attention import flash_attention

    shape = (2, 2, 261, 32)  # multiple K/Q blocks with a padded tail
    B, H, N, Dh = shape
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    kpad = np.zeros((B, N), bool)
    kpad[0, :130] = True
    kpad[1, 7:77] = True
    kpad = jnp.asarray(kpad)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kpad) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, padding_bias(kpad, H)) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_multi_head_attention_mask_dispatch():
    """multi_head_attention(key_padding_mask=...) == prebuilt-bias path."""
    from multimodal_diffusion_tpu.ops.attention import (
        multi_head_attention, padding_bias,
    )

    shape = (2, 2, 70, 16)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(ki, shape, jnp.float32) for ki in ks)
    kpad = jnp.asarray(np.random.default_rng(0).random((2, 70)) < 0.3)
    a = multi_head_attention(q, k, v, key_padding_mask=kpad)
    b = mha_reference(q, k, v, padding_bias(kpad, 2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_fully_masked_row_agrees_across_backends():
    """A batch element whose keys are ALL padded returns exact zeros from
    the flash kernel; the XLA fallback now zeroes it too (ADVICE r2)."""
    import numpy as np

    from multimodal_diffusion_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(0)
    B, H, N, Dh = 2, 2, 8, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    kpad = jnp.zeros((B, N), bool).at[1].set(True)  # element 1 fully masked

    out_xla = multi_head_attention(q, k, v, key_padding_mask=kpad,
                                   use_flash=False)
    out_flash = flash_attention_interpret(q, k, v, kpad)
    assert jnp.all(out_xla[1] == 0.0)
    assert jnp.all(out_flash[1] == 0.0)
    # the unmasked element is untouched
    np.testing.assert_allclose(np.asarray(out_xla[0]),
                               np.asarray(out_flash[0]), atol=2e-2)
