"""DPM-Solver++(2M) sampler (ops/schedule.dpmpp_2m_step + sampling.sampler).

The reference has only DDIM (sample_clip.py:316-389).  Contract:

  * on an exactly-solvable probability-flow ODE (gaussian data, analytic
    optimal denoiser) the 2nd-order solver at S steps is closer to the
    fine-grained solution than DDIM at the same S — the whole point of
    shipping it,
  * with a perfect x0 predictor both solvers land exactly on x0,
  * the config path (sampling.sampler) reaches the scan sampler and
    produces finite samples end-to-end on the tiny AV model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_diffusion_tpu.ops import schedule as S


def _abar(T=1000):
    betas = S.make_beta_schedule(T, "cosine", 1e-4, 0.02)
    _, abar = S.alphas_cumprod_from_betas(betas)
    return jnp.asarray(abar, jnp.float32)


def _run_solver(solver, x_T, sched, abar, eps_fn):
    """Roll a sampler over `sched` (t_now, t_prev pairs) with eps_fn(x, t)
    as the model."""
    x = x_T
    x0_prev = jnp.zeros_like(x)
    h_prev = jnp.zeros((x.shape[0],) + (1,) * (x.ndim - 1), jnp.float32)
    for i in range(len(sched) - 1):
        t_now = jnp.full((x.shape[0],), int(sched[i]), jnp.int32)
        t_prev = jnp.full((x.shape[0],), int(sched[i + 1]), jnp.int32)
        eps = eps_fn(x, t_now)
        if solver == "ddim":
            x = S.ddim_step(x, t_now, t_prev, eps, abar, eta=0.0)
        else:
            x, x0_prev, h_prev = S.dpmpp_2m_step(
                x, t_now, t_prev, eps, abar, x0_prev, h_prev)
    return x


def test_dpmpp_converges_faster_than_ddim_on_exact_ode():
    """Gaussian data x0 ~ N(0, s^2): the optimal eps-predictor is linear,
    eps*(x,t) = sigma_t x / (alpha_t^2 s^2 + sigma_t^2)^(1/2 scaling) —
    derived from x0*(x,t) = alpha_t s^2 x / (alpha_t^2 s^2 + sigma_t^2).
    The probability-flow ODE is exactly integrable numerically with a fine
    DDIM grid; at 10 steps the 2nd-order solver must beat 1st-order DDIM."""
    T = 1000
    abar = _abar(T)
    s2 = 4.0  # data variance

    def eps_fn(x, t):
        a = abar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        x0 = jnp.sqrt(a) * s2 * x / (a * s2 + (1.0 - a))
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(jnp.clip(1.0 - a, 1e-12,
                                                          None))

    x_T = jax.random.normal(jax.random.PRNGKey(0), (8, 16), jnp.float32)

    truth = _run_solver("ddim", x_T, S.make_sampling_schedule(T, 400), abar,
                        eps_fn)
    sched10 = S.make_sampling_schedule(T, 10)
    end_ddim = _run_solver("ddim", x_T, sched10, abar, eps_fn)
    end_dpm = _run_solver("dpmpp_2m", x_T, sched10, abar, eps_fn)

    err_ddim = float(jnp.linalg.norm(end_ddim - truth))
    err_dpm = float(jnp.linalg.norm(end_dpm - truth))
    assert np.isfinite(err_dpm)
    # 2nd order must be meaningfully better at the same budget
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)


@pytest.mark.parametrize("param", ["eps", "x0", "v"])
def test_dpmpp_perfect_predictor_lands_on_x0(param):
    """A model that always knows the true x0 must be sampled back to it
    exactly (final step returns D = x0) under every parameterization."""
    T = 1000
    abar = _abar(T)
    x0_true = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 8)), jnp.float32)

    def pred_fn(x, t):
        a = abar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        if param == "x0":
            return x0_true
        eps = (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(
            jnp.clip(1.0 - a, 1e-12, None))
        if param == "eps":
            return eps
        return jnp.sqrt(a) * eps - jnp.sqrt(
            jnp.clip(1.0 - a, 0.0, None)) * x0_true

    x_T = jax.random.normal(jax.random.PRNGKey(2), (4, 8), jnp.float32)
    x = x_T
    x0_prev = jnp.zeros_like(x)
    h_prev = jnp.zeros((4, 1), jnp.float32)
    sched = S.make_sampling_schedule(T, 8)
    for i in range(len(sched) - 1):
        t_now = jnp.full((4,), int(sched[i]), jnp.int32)
        t_prev = jnp.full((4,), int(sched[i + 1]), jnp.int32)
        x, x0_prev, h_prev = S.dpmpp_2m_step(
            x, t_now, t_prev, pred_fn(x, t_now), abar, x0_prev, h_prev,
            param=param)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true),
                               atol=2e-4, rtol=2e-4)


def test_sampler_config_plumbing_and_eta_guard():
    from multimodal_diffusion_tpu.infer.ddim import sampler_from_config
    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )
    from tests._tiny import tiny_cfg

    cfg = tiny_cfg()
    cfg["sampling"]["sampler"] = "dpmpp_2m"
    cfg["diffusion"]["audio"]["sampler_steps"] = 3
    model = AVDiffusionModel(AVDiffusionConfig.from_config(cfg))
    sample, sched = sampler_from_config(model, cfg, "audio")
    assert len(sched) == 4

    # eta > 0 with the ODE solver must be rejected up front
    bad = tiny_cfg()
    bad["sampling"]["sampler"] = "dpmpp_2m"
    bad["sampling"]["ddim_eta"] = 0.5
    model_b = AVDiffusionModel(AVDiffusionConfig.from_config(bad))
    with pytest.raises(ValueError, match="deterministic"):
        sampler_from_config(model_b, bad, "audio")


@pytest.mark.slow
def test_dpmpp_end_to_end_tiny_model():
    """Full V->A sampling through the scan sampler with sampler=dpmpp_2m."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from _tiny import tiny_cfg
    from multimodal_diffusion_tpu.infer.sample_clip import (
        build_components, sample_one_direction,
    )

    cfg = tiny_cfg()
    cfg["sampling"]["sampler"] = "dpmpp_2m"
    cfg["sampling"]["num_steps"] = 4
    T = int(cfg["data"]["clip_seconds"] * cfg["video"]["fps"])
    H, W = cfg["video"]["size"]
    frames = np.random.default_rng(0).integers(
        0, 255, (1, T, H, W, 3), dtype=np.uint8)
    model, params = build_components(cfg)
    out = sample_one_direction(
        cfg=cfg, model=model, params=params, prompt_modality="video",
        prompt_video=frames, rng=jax.random.PRNGKey(0))
    wav = np.asarray(out["audio"])
    assert wav.shape[0] == 1 and np.isfinite(wav).all()


def test_cfg_rescale_end_to_end_and_identity():
    """sampling.cfg_rescale: phi=0 must be bit-identical to the unset
    config (same jit cache entry); phi=1 produces finite, different audio
    whose eps trajectory is std-matched to the conditional branch."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from _tiny import tiny_cfg
    from multimodal_diffusion_tpu.infer.sample_clip import (
        build_components, sample_one_direction,
    )

    cfg = tiny_cfg()
    cfg["sampling"]["guidance_scale"] = {"audio": 7.0, "video": 7.0}
    T = int(cfg["data"]["clip_seconds"] * cfg["video"]["fps"])
    H, W = cfg["video"]["size"]
    frames = np.random.default_rng(1).integers(
        0, 255, (1, T, H, W, 3), dtype=np.uint8)
    model, params = build_components(cfg)

    def run(phi):
        c = {**cfg, "sampling": {**cfg["sampling"], "cfg_rescale": phi}}
        out = sample_one_direction(
            cfg=c, model=model, params=params, prompt_modality="video",
            prompt_video=frames, rng=jax.random.PRNGKey(0))
        return np.asarray(out["audio"])

    base = run(0.0)
    full = run(1.0)
    assert np.isfinite(base).all() and np.isfinite(full).all()
    # phi=0 == plain combine (the phi branch is statically compiled out)
    out_unset = sample_one_direction(
        cfg=cfg, model=model, params=params, prompt_modality="video",
        prompt_video=frames, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(base, np.asarray(out_unset["audio"]))
    # phi=1 at g=7 must actually change the trajectory
    assert np.abs(base - full).max() > 0


def test_cfg_rescale_std_matching_formula():
    """Unit check of the rescale arithmetic: at phi=1 the combined eps is
    scaled to eps_cond's per-sample std."""
    rng = np.random.default_rng(0)
    eps_cond = jnp.asarray(rng.standard_normal((2, 5, 7)), jnp.float32)
    eps_null = jnp.asarray(rng.standard_normal((2, 5, 7)), jnp.float32)
    g = 9.0
    eps_hat = eps_null + g * (eps_cond - eps_null)
    ax = (1, 2)
    s_cond = jnp.std(eps_cond, axis=ax, keepdims=True)
    s_hat = jnp.std(eps_hat, axis=ax, keepdims=True)
    rescaled = eps_hat * (s_cond / jnp.maximum(s_hat, 1e-12))
    np.testing.assert_allclose(
        np.std(np.asarray(rescaled), axis=(1, 2)),
        np.asarray(s_cond).squeeze(), rtol=1e-5)
