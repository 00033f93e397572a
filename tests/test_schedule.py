"""Golden-value tests for diffusion schedule math.

Expected values were generated once from the PyTorch reference
(`avdiff/utils/schedule_utils.py` @ /root/reference, fp32) and hardcoded here,
so this package's jnp implementation is pinned to the reference numerics
without importing the reference at test time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.ops import schedule as S

IDX = [0, 1, 10, 100, 500, 998, 999]

GOLDEN_BETAS = {
    "cosine": [4.1246414185e-05, 4.6133995056e-05, 8.9824199677e-05,
               5.3179264069e-04, 3.1558275223e-03, 7.4996817112e-01,
               9.9900001287e-01],
    "linear": [9.9999997474e-05, 1.1991991778e-04, 2.9919919325e-04,
               2.0919919480e-03, 1.0059959255e-02, 1.9980080426e-02,
               1.9999999553e-02],
    "sigmoid": [1.4920519607e-04, 1.4979831758e-04, 1.5546786017e-04,
                2.6262883330e-04, 1.0079878382e-02, 1.9950199872e-02,
                1.9950795919e-02],
}
GOLDEN_ABAR = {
    "cosine": [9.9995875359e-01, 9.9991261959e-01, 9.9927902222e-01,
               9.7157591581e-01, 4.9228531122e-01, 2.4289215617e-06,
               2.4288902001e-09],
    "linear": [9.9989998341e-01, 9.9978005886e-01, 9.9780648947e-01,
               8.9514136314e-01, 7.7796652913e-02, 4.1181941924e-05,
               4.0358303522e-05],
    "sigmoid": [9.9985080957e-01, 9.9970102310e-01, 9.9832630157e-01,
                9.8049193621e-01, 2.9888758063e-01, 4.0489623643e-05,
                3.9681821363e-05],
}


@pytest.mark.parametrize("kind", ["cosine", "linear", "sigmoid"])
def test_beta_schedule_golden(kind):
    betas = S.make_beta_schedule(1000, kind=kind, min_beta=1e-4, max_beta=0.02)
    assert betas.shape == (1000,) and betas.dtype == np.float32
    _, abar = S.alphas_cumprod_from_betas(betas)
    np.testing.assert_allclose(betas[IDX], GOLDEN_BETAS[kind], rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(abar[IDX], GOLDEN_ABAR[kind], rtol=2e-4, atol=1e-12)


def test_timestep_embedding_golden():
    golden = np.array(
        [[1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0],
         [0.75390226, 0.7648422, 0.997551, 0.9999755,
          0.6569866, 0.6442176, 0.06994285, 0.00699994],
         [0.9996498, 0.80745506, -0.8444698, 0.54114354,
          -0.02646075, -0.5899291, -0.53560317, 0.8409302]],
        dtype=np.float32,
    )
    emb = S.timestep_embedding(jnp.array([0, 7, 999]), 8)
    # atol 2e-4: fp32 sin/cos of large args (t=999) differs slightly between
    # XLA's libm and torch's; small-t rows agree to <1e-6.
    np.testing.assert_allclose(np.asarray(emb), golden, rtol=1e-5, atol=2e-4)
    # odd dim pads a zero column
    emb9 = S.timestep_embedding(jnp.array([3]), 9)
    assert emb9.shape == (1, 9) and float(emb9[0, -1]) == 0.0


def test_q_sample_golden():
    _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(1000, "cosine"))
    x0 = jnp.arange(12, dtype=jnp.float32).reshape(2, 2, 3) / 11.0
    eps = jnp.linspace(-1, 1, 12).reshape(2, 2, 3)
    xt, eps_out = S.q_sample(x0, jnp.array([17, 750]), jnp.asarray(abar), eps=eps)
    golden = np.array(
        [[[-0.03854176, 0.05930738, 0.15715653],
          [0.25500566, 0.3528548, 0.45070392]],
         [[0.29054394, 0.49324232, 0.69594073],
          [0.8986392, 1.1013376, 1.3040359]]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(np.asarray(xt), golden, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eps_out), np.asarray(eps), rtol=0, atol=0)


def test_q_sample_with_key_statistics():
    _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(1000, "cosine"))
    x0 = jnp.zeros((4, 64, 64))
    xt, eps = S.q_sample(x0, jnp.array([500] * 4), jnp.asarray(abar),
                         key=jax.random.PRNGKey(0))
    # at t=500 (abar~0.492) x_t = sqrt(1-abar)*eps -> std ~ sqrt(0.5077)
    assert abs(float(jnp.std(xt)) - float(jnp.sqrt(1 - abar[500]))) < 0.02
    assert xt.shape == x0.shape and eps.shape == x0.shape


def test_ddim_step_golden():
    _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(1000, "cosine"))
    abar = jnp.asarray(abar)
    xt = jnp.linspace(-0.5, 0.7, 12).reshape(2, 2, 3)
    eh = jnp.linspace(0.3, -0.4, 12).reshape(2, 2, 3)
    t_now = jnp.array([999, 500])
    t_prev = jnp.array([899, -1])
    out = S.ddim_step(xt, t_now, t_prev, eh, abar, eta=0.0)
    golden = np.array(
        [[[-2.5192363e+03, -1.9753091e+03, -1.4313818e+03],
          [-8.8745471e+02, -3.4352759e+02, 2.0039960e+02]],
         [[3.0335653e-01, 5.2346450e-01, 7.4357241e-01],
          [9.6368027e-01, 1.1837883e+00, 1.4038962e+00]]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(np.asarray(out), golden, rtol=3e-5)
    # eta > 0 with zero injected noise (golden from reference with z=0)
    out_eta = S.ddim_step(xt, t_now, t_prev, eh, abar, eta=0.5,
                          noise=jnp.zeros_like(xt))
    golden_eta = np.array(
        [[[-2.5192761e+03, -1.9753403e+03, -1.4314047e+03],
          [-8.8746918e+02, -3.4353360e+02, 2.0040201e+02]],
         [[3.0335653e-01, 5.2346450e-01, 7.4357241e-01],
          [9.6368027e-01, 1.1837883e+00, 1.4038962e+00]]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(np.asarray(out_eta), golden_eta, rtol=3e-5)


def test_sampling_schedule():
    s10 = S.make_sampling_schedule(1000, 10)
    assert s10.tolist() == [999, 899, 799, 699, 599, 499, 399, 299, 199, 99, -1]
    s25 = S.make_sampling_schedule(1000, 25)
    assert s25[0] == 999 and s25[-1] == -1 and len(s25) == 26
    assert np.all(np.diff(s25) < 0)


def test_ddim_roundtrip_recovers_x0():
    """eta=0, one giant step from t to -1 with the true eps recovers x0."""
    _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(1000, "cosine"))
    abar = jnp.asarray(abar)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 8, 16))
    t = jnp.array([300, 300])
    xt, eps = S.q_sample(x0, t, abar, key=jax.random.PRNGKey(2))
    x0_rec = S.ddim_step(xt, t, jnp.array([-1, -1]), eps, abar, eta=0.0)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-4)
