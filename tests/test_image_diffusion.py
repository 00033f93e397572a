"""Pixel-space DDPM family: train-step learning + scan ancestral sampler
(BASELINE config #1, CPU-runnable)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_diffusion_tpu.models.image_diffusion import (
    PixelDiT, PixelDiTConfig, make_ancestral_sampler, make_pixel_train_step,
    patch_image, unpatch_image,
)
from multimodal_diffusion_tpu.models.mmdit import MMDiTConfig
from multimodal_diffusion_tpu.ops import schedule as S

TINY = PixelDiTConfig(
    image_size=8, channels=1, patch=4, width=32,
    core=MMDiTConfig(d_model=32, n_layers=1, n_heads=2, mlp_ratio=2.0,
                     dropout=0.0),
    steps=20,
)


def test_patch_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    tok = patch_image(x, 4)
    assert tok.shape == (2, 16, 48)
    back = unpatch_image(tok, 3, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_ddpm_step_variance_and_t0():
    betas = S.make_beta_schedule(100, "linear")
    _, abar = S.alphas_cumprod_from_betas(betas)
    x = jnp.ones((2, 1, 4, 4))
    eps = jnp.zeros_like(x)
    z = jnp.ones_like(x)
    # at t=0 no noise is added regardless of z
    out0 = S.ddpm_step(x, jnp.array([0, 0]), eps, jnp.asarray(betas),
                       jnp.asarray(abar), z)
    out0_nz = S.ddpm_step(x, jnp.array([0, 0]), eps, jnp.asarray(betas),
                          jnp.asarray(abar), 5.0 * z)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out0_nz))
    # at t>0 the noise term is active
    out5 = S.ddpm_step(x, jnp.array([5, 5]), eps, jnp.asarray(betas),
                       jnp.asarray(abar), z)
    out5_nz = S.ddpm_step(x, jnp.array([5, 5]), eps, jnp.asarray(betas),
                          jnp.asarray(abar), 5.0 * z)
    assert not np.allclose(np.asarray(out5), np.asarray(out5_nz))


@pytest.mark.slow
def test_pixel_train_learns_and_sampler_runs():
    model = PixelDiT(TINY)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, 1, 8, 8), minval=-1, maxval=1)
    params = model.init(
        {"params": rng}, x, jnp.zeros((4,), jnp.int32)
    )["params"]
    from flax.core import meta

    params = meta.unbox(params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_pixel_train_step(model, tx))

    # fixed dataset of constant images: eps-loss must drop
    data = jnp.stack([jnp.full((1, 8, 8), 0.5), jnp.full((1, 8, 8), -0.5),
                      jnp.zeros((1, 8, 8)), jnp.full((1, 8, 8), 0.25)])
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        params, opt_state, key, loss = step(params, opt_state, key, data)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    sample = jax.jit(make_ancestral_sampler(model), static_argnums=(2,))
    imgs = sample(params, jax.random.PRNGKey(2), 2)
    assert imgs.shape == (2, 1, 8, 8)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all() and arr.min() >= -1.0 and arr.max() <= 1.0


def test_clip_x0_bounds_trajectory():
    """With clip_x0, a single DDIM step from near-pure noise stays bounded
    even when eps_hat is wrong (the failure mode that made unclipped
    pixel sampling diverge: 1/sqrt(a_bar) > 1e4 at t ~ T)."""
    betas = S.make_beta_schedule(1000, "cosine")
    _, abar = S.alphas_cumprod_from_betas(betas)
    abar = jnp.asarray(abar)
    x_t = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 8))
    bad_eps = jnp.zeros_like(x_t)  # maximally wrong at t=999
    t = jnp.array([999])
    tp = jnp.array([979])
    unclipped = S.ddim_step(x_t, t, tp, bad_eps, abar)
    clipped = S.ddim_step(x_t, t, tp, bad_eps, abar, clip_x0=(-1.0, 1.0))
    assert float(jnp.abs(unclipped).max()) > 100.0  # diverges
    assert float(jnp.abs(clipped).max()) < 5.0  # bounded
    # ddpm_step likewise
    z = jnp.zeros_like(x_t)
    d_unc = S.ddpm_step(x_t, t, bad_eps, jnp.asarray(betas), abar, z)
    d_clip = S.ddpm_step(x_t, t, bad_eps, jnp.asarray(betas), abar, z,
                         clip_x0=(-1.0, 1.0))
    assert float(jnp.abs(d_clip).max()) <= float(jnp.abs(d_unc).max())
