"""Diffusion schedule math — pure jnp, always fp32.

Numerically matched to the reference implementation
(`avdiff/utils/schedule_utils.py:14-200`): the cosine schedule is
Nichol & Dhariwal (s=0.008) with betas clipped to [1e-8, 0.999]; q_sample is
x_t = sqrt(a_bar_t) x0 + sqrt(1 - a_bar_t) eps; the DDIM step is the
x0-prediction form with a_bar(-1) = 1 and the same clamp constants.  Golden
tests in tests/test_schedule.py verify agreement with independently computed
values at fp32.

All functions are trace-safe (no data-dependent Python control flow) so they
can live inside `jit`/`lax.scan`.  Schedule *construction* is host-side numpy
(static per config); the per-step math is jnp.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# beta schedules (host-side: static per config, tiny arrays)
# ---------------------------------------------------------------------------


def make_beta_schedule(
    steps: int,
    kind: str = "cosine",
    min_beta: float = 1e-4,
    max_beta: float = 2e-2,
) -> np.ndarray:
    """Return betas[t], t = 0..steps-1, as fp32 numpy.

    kinds: "cosine" (Nichol-Dhariwal, s=0.008), "linear", "sigmoid".
    Matches reference schedule_utils.py:14-49 numerically.
    """
    kind = kind.lower()
    if kind == "linear":
        betas = np.linspace(min_beta, max_beta, steps, dtype=np.float32)
    elif kind == "sigmoid":
        xs = np.linspace(-6.0, 6.0, steps, dtype=np.float32)
        sig = 1.0 / (1.0 + np.exp(-xs))
        betas = (min_beta + (max_beta - min_beta) * sig).astype(np.float32)
    elif kind == "cosine":
        s = 0.008
        t = np.linspace(0.0, steps, steps + 1, dtype=np.float32)
        f = np.cos(((t / steps + s) / (1.0 + s)) * math.pi / 2.0) ** 2
        a_bar = f / f[0]
        betas = (1.0 - a_bar[1:] / a_bar[:-1]).astype(np.float32)
    else:
        raise ValueError(f"Unknown schedule kind: {kind}")
    return np.clip(betas, 1e-8, 0.999).astype(np.float32)


def alphas_cumprod_from_betas(betas: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Return (alphas[t], alpha_bar[t] = cumprod alphas)."""
    betas = np.asarray(betas, dtype=np.float32)
    alphas = 1.0 - betas
    return alphas, np.cumprod(alphas, axis=0).astype(np.float32)


def make_sampling_schedule(T_train: int, T_sample: int) -> np.ndarray:
    """Decreasing int schedule of length T_sample+1 from T_train-1 down to -1.

    e.g. T_train=1000, T_sample=10 -> [999, 899, ..., 99, -1] (11 ints).
    Matches reference schedule_utils.py:132-143 (np.round == torch.round at
    these grids; the reference's extra "non-increasing" clamp is a no-op).
    """
    grid = np.linspace(T_train - 1, -1, T_sample + 1)
    return np.round(grid).astype(np.int32)


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10_000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, dim], fp32.

    NOTE: the reference orders halves as [cos | sin] (schedule_utils.py:64-86),
    not the more common [sin | cos]; we keep that convention so any ported
    weights see identical features.  Odd dims are right-padded with one zero.
    """
    t = t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# forward process q(x_t | x_0)
# ---------------------------------------------------------------------------


def _bcast_gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] with trailing singleton dims so it broadcasts to an ndim array."""
    v = table.astype(jnp.float32)[t]
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def q_sample(
    x0: jnp.ndarray,
    t: jnp.ndarray,
    alpha_bar: jnp.ndarray,
    eps: Optional[jnp.ndarray] = None,
    *,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x_t = sqrt(a_bar_t) x0 + sqrt(1 - a_bar_t) eps; returns (x_t, eps).

    Pass `eps` explicitly or a PRNG `key` (JAX has no hidden RNG state).
    Noising math runs in fp32 and is cast back to x0.dtype at the end, so
    bf16 activations still see fp32-accurate schedule coefficients.
    """
    if eps is None:
        if key is None:
            raise ValueError("q_sample needs either `eps` or `key`")
        eps = jax.random.normal(key, x0.shape, dtype=jnp.float32)
    a_bar_t = _bcast_gather(alpha_bar, t, x0.ndim)
    sqrt_ab = jnp.sqrt(a_bar_t)
    sqrt_omb = jnp.sqrt(jnp.clip(1.0 - a_bar_t, 0.0, None))
    x_t = sqrt_ab * x0.astype(jnp.float32) + sqrt_omb * eps.astype(jnp.float32)
    return x_t.astype(x0.dtype), eps.astype(x0.dtype)


def prediction_target(
    x0: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    alpha_bar: jnp.ndarray,
    param: str = "eps",
) -> jnp.ndarray:
    """The regression target for a model predicting under `param`:
    "eps" -> eps, "x0" -> x0, "v" -> sqrt(a_bar) eps - sqrt(1-a_bar) x0.
    Computed in fp32, returned in x0.dtype."""
    if param == "eps":
        return eps
    if param == "x0":
        return x0
    if param == "v":
        a_bar_t = _bcast_gather(alpha_bar, t, x0.ndim)
        v = (jnp.sqrt(a_bar_t) * eps.astype(jnp.float32)
             - jnp.sqrt(jnp.clip(1.0 - a_bar_t, 0.0, None))
             * x0.astype(jnp.float32))
        return v.astype(x0.dtype)
    raise ValueError(f"param must be 'eps'|'x0'|'v', got {param!r}")


# ---------------------------------------------------------------------------
# DDIM reverse step
# ---------------------------------------------------------------------------


def ddim_step(
    x_t: jnp.ndarray,
    t_now: jnp.ndarray,
    t_prev: jnp.ndarray,
    eps_hat: jnp.ndarray,
    alpha_bar: jnp.ndarray,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
    *,
    key: Optional[jax.Array] = None,
    clip_x0: Optional[Tuple[float, float]] = None,
    param: str = "eps",
) -> jnp.ndarray:
    """One DDIM update x_{t_prev} <- x_t (x0-prediction form).

      x0_pred = (x_t - sqrt(1-a_t) eps) / sqrt(a_t)
      sigma   = eta * sqrt((1-a_prev)/(1-a_t) * (1 - a_t/a_prev))
      x_prev  = sqrt(a_prev) x0_pred + sqrt(1 - a_prev - sigma^2) eps + sigma z

    a_bar(-1) := 1 for the final step (t_prev == -1); clamp constants match the
    reference (schedule_utils.py:146-200).  `eta` is a static Python float, so
    the eta == 0 branch compiles away entirely.

    `param` selects the model-output parameterization `eps_hat` is expressed
    in: "eps" (the reference's convention), "x0" (direct denoised estimate —
    useful for low-SNR-dominated targets like speech audio), or "v"
    (v = sqrt(a) eps - sqrt(1-a) x0, Salimans & Ho 2022).  The update itself
    is identical — the prediction is converted to the (x0, eps) pair.
    """
    xdtype = x_t.dtype
    x_t = x_t.astype(jnp.float32)
    eps_hat = eps_hat.astype(jnp.float32)

    a_t = _bcast_gather(alpha_bar, jnp.clip(t_now, 0, None), x_t.ndim)
    a_prev_raw = _bcast_gather(alpha_bar, jnp.clip(t_prev, 0, None), x_t.ndim)
    is_final = (t_prev < 0).reshape((-1,) + (1,) * (x_t.ndim - 1))
    a_prev = jnp.where(is_final, jnp.ones_like(a_prev_raw), a_prev_raw)

    sqrt_a_t = jnp.sqrt(a_t)
    sqrt_omb_t = jnp.sqrt(jnp.clip(1.0 - a_t, 0.0, None))
    sqrt_a_prev = jnp.sqrt(a_prev)

    # x0 estimate: ONE conversion table shared with dpmpp_2m_step
    x0_pred = to_x0_pred(x_t, eps_hat, a_t, param=param)
    # eps side of the pair (per-param forms kept: "eps" uses the model
    # output verbatim, "v" uses the exact rotation — re-deriving either
    # from x0_pred would change numerics through the clamps)
    if param == "x0":
        eps_hat = (x_t - sqrt_a_t * x0_pred) / jnp.clip(sqrt_omb_t, 1e-4, None)
    elif param == "v":
        eps_hat = sqrt_omb_t * x_t + sqrt_a_t * eps_hat
    if clip_x0 is not None:
        # clip the denoised estimate to the data range (standard for
        # pixel-space sampling: at large t, 1/sqrt(a_bar) amplifies epsilon
        # errors by >1e4 and unclipped trajectories diverge; the reference
        # never clips, so the AV latent path leaves this off by default)
        x0_pred = jnp.clip(x0_pred, clip_x0[0], clip_x0[1])

    if eta > 0.0:
        frac = jnp.clip((1.0 - a_prev) / jnp.clip(1.0 - a_t, 1e-8, None), 0.0, None)
        one_minus_ratio = jnp.clip(1.0 - a_t / jnp.clip(a_prev, 1e-8, None), 0.0, None)
        sigma = eta * jnp.sqrt(frac * one_minus_ratio)
        if noise is None:
            if key is None:
                raise ValueError("ddim_step with eta>0 needs `noise` or `key`")
            noise = jax.random.normal(key, x_t.shape, dtype=jnp.float32)
        stoch = sigma * noise.astype(jnp.float32)
        coeff_eps = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0, None))
    else:
        stoch = 0.0
        coeff_eps = jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0, None))

    x_prev = sqrt_a_prev * x0_pred + coeff_eps * eps_hat + stoch
    return x_prev.astype(xdtype)


def ddpm_step(
    x_t: jnp.ndarray,
    t: jnp.ndarray,  # [B] int current timestep (>= 0)
    eps_hat: jnp.ndarray,
    betas: jnp.ndarray,
    alpha_bar: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    posterior_variance: bool = True,
    clip_x0: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """One ancestral DDPM step x_{t-1} <- x_t (Ho et al. 2020, eq. 11):

      mu = (x_t - beta_t / sqrt(1 - a_bar_t) * eps_hat) / sqrt(alpha_t)
      sigma^2 = beta_tilde_t = (1 - a_bar_{t-1}) / (1 - a_bar_t) * beta_t
                (or beta_t when posterior_variance=False)
      x_{t-1} = mu + sigma * z   (no noise at t == 0)

    Used by the pixel-space DDPM family (BASELINE config #1); the AV stack
    samples with DDIM.  fp32 math, cast back to x_t.dtype.
    """
    xdtype = x_t.dtype
    x_t = x_t.astype(jnp.float32)
    eps_hat = eps_hat.astype(jnp.float32)
    nd = x_t.ndim

    beta_t = _bcast_gather(betas, t, nd)
    a_t = 1.0 - beta_t
    ab_t = _bcast_gather(alpha_bar, t, nd)
    ab_prev_raw = _bcast_gather(alpha_bar, jnp.clip(t - 1, 0, None), nd)
    is_t0 = (t == 0).reshape((-1,) + (1,) * (nd - 1))
    ab_prev = jnp.where(is_t0, jnp.ones_like(ab_prev_raw), ab_prev_raw)

    if clip_x0 is not None:
        # posterior mean through the clipped x0 estimate (Ho et al. eq. 7)
        x0 = (x_t - jnp.sqrt(jnp.clip(1.0 - ab_t, 0.0, None)) * eps_hat)
        x0 = x0 / jnp.sqrt(jnp.clip(ab_t, 1e-20, None))
        x0 = jnp.clip(x0, clip_x0[0], clip_x0[1])
        denom = jnp.clip(1.0 - ab_t, 1e-20, None)
        coef_x0 = jnp.sqrt(ab_prev) * beta_t / denom
        coef_xt = jnp.sqrt(a_t) * (1.0 - ab_prev) / denom
        mean = coef_x0 * x0 + coef_xt * x_t
    else:
        mean = (x_t - beta_t / jnp.sqrt(jnp.clip(1.0 - ab_t, 1e-20, None)) * eps_hat)
        mean = mean / jnp.sqrt(a_t)
    if posterior_variance:
        var = (1.0 - ab_prev) / jnp.clip(1.0 - ab_t, 1e-20, None) * beta_t
    else:
        var = beta_t
    sigma = jnp.where(is_t0, 0.0, jnp.sqrt(jnp.clip(var, 0.0, None)))
    return (mean + sigma * noise.astype(jnp.float32)).astype(xdtype)


def to_x0_pred(
    x_t: jnp.ndarray,
    pred: jnp.ndarray,
    a_t: jnp.ndarray,
    param: str = "eps",
) -> jnp.ndarray:
    """Convert a model prediction under `param` ('eps'|'x0'|'v') into the
    denoised-data estimate x0 (same conversions as ddim_step).  a_t is a_bar
    broadcast to x_t's shape; fp32 in, fp32 out."""
    sqrt_a = jnp.sqrt(a_t)
    sqrt_omb = jnp.sqrt(jnp.clip(1.0 - a_t, 0.0, None))
    if param == "eps":
        return (x_t - sqrt_omb * pred) / jnp.clip(sqrt_a, 1e-8, None)
    if param == "x0":
        return pred
    if param == "v":
        return sqrt_a * x_t - sqrt_omb * pred
    raise ValueError(f"param must be 'eps'|'x0'|'v', got {param!r}")


def dpmpp_2m_step(
    x_t: jnp.ndarray,
    t_now: jnp.ndarray,
    t_prev: jnp.ndarray,
    pred: jnp.ndarray,
    alpha_bar: jnp.ndarray,
    x0_prev: jnp.ndarray,
    h_prev: jnp.ndarray,
    *,
    param: str = "eps",
    clip_x0: Optional[Tuple[float, float]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One DPM-Solver++(2M) update (Lu et al. 2022, data-prediction
    multistep, deterministic/ODE form) — a 2nd-order solver that reaches
    DDIM-at-50-steps quality in roughly half the steps (the reference has
    only DDIM, sample_clip.py:316-389; this is a TPU-era inference upgrade,
    selected via `sampling.sampler: dpmpp_2m`).

    With alpha_t = sqrt(a_bar), sigma_t = sqrt(1 - a_bar),
    lambda_t = log(alpha_t / sigma_t), h = lambda_prev - lambda_now:

        D = (1 + 1/(2 r)) x0_now - 1/(2 r) x0_last,  r = h_prev / h
        x_prev = (sigma_prev / sigma_now) x_t - alpha_prev (e^{-h} - 1) D

    First step (signalled by h_prev <= 0) uses D = x0_now (1st-order =
    DDIM's x0 form).  The final step (t_prev == -1, a_bar(-1) := 1 as in
    ddim_step) returns D exactly (the sigma_prev -> 0 limit).

    Returns (x_prev, x0_now, h) so the caller's scan can carry the
    multistep state.  fp32 math, cast back to x_t.dtype.
    """
    xdtype = x_t.dtype
    x_t = x_t.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    nd = x_t.ndim

    a_t = _bcast_gather(alpha_bar, jnp.clip(t_now, 0, None), nd)
    a_prev_raw = _bcast_gather(alpha_bar, jnp.clip(t_prev, 0, None), nd)
    is_final = (t_prev < 0).reshape((-1,) + (1,) * (nd - 1))
    # a_bar(-1) := 1; clip keeps lambda finite, the final step is exact via
    # the where() below
    a_prev = jnp.where(is_final,
                       jnp.full_like(a_prev_raw, 1.0 - 1e-10), a_prev_raw)

    x0_now = to_x0_pred(x_t, pred, a_t, param=param)
    if clip_x0 is not None:
        x0_now = jnp.clip(x0_now, clip_x0[0], clip_x0[1])

    def lam(a):
        return 0.5 * (jnp.log(jnp.clip(a, 1e-20, None))
                      - jnp.log(jnp.clip(1.0 - a, 1e-20, None)))

    lam_now, lam_prev = lam(a_t), lam(a_prev)
    h = lam_prev - lam_now  # > 0 (denoising direction)

    first = (h_prev <= 0.0)
    r = h_prev / jnp.clip(h, 1e-20, None)
    # lower-order final: the final step's h is effectively infinite
    # (a_bar(-1)=1) and x_prev = D directly, so a 2nd-order extrapolated D
    # overshoots — use the 1st-order D = x0 there (standard practice for
    # multistep DPM-Solver++ at low step counts)
    coef = jnp.where(first | is_final, 0.0,
                     1.0 / (2.0 * jnp.clip(r, 1e-20, None)))
    D = (1.0 + coef) * x0_now - coef * x0_prev.astype(jnp.float32)

    sigma_now = jnp.sqrt(jnp.clip(1.0 - a_t, 1e-20, None))
    sigma_prev = jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0, None))
    alpha_prev = jnp.sqrt(a_prev)
    x_prev = (sigma_prev / sigma_now) * x_t \
        - alpha_prev * (jnp.exp(-h) - 1.0) * D
    x_prev = jnp.where(is_final, D, x_prev)
    return x_prev.astype(xdtype), x0_now, h
