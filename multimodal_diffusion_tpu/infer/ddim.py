"""Scan-compiled DDIM sampling with batched classifier-free guidance.

Capability parity with the reference sampler loop (sample_clip.py:316-389):
DDIM with CFG in either direction (video->audio or audio->video); the prompt
latent is clean (embedded at t=0) and frozen, only the target latent evolves;
null conditioning = zeroing the prompt's embedded tokens; eps-hat =
eps_null + g * (eps_cond - eps_null).

TPU-native redesign (BASELINE.md north star):
  * the whole S-step loop is ONE `jax.lax.scan` compiled on device — zero
    per-step host sync (the reference runs a Python loop with 2 host-synced
    forwards per step).
  * CFG is a *batched dual forward*: cond and null are stacked on the batch
    axis and denoised in one fused pass, halving kernel-launch count and
    letting the MXU see a 2B batch (reference does 2 separate core calls).
  * the prompt's raw tokens are computed once and hoisted out of the scan
    (the reference re-tokenizes the frozen prompt every step,
    sample_clip.py:322-323).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.diffusion import AVDiffusionModel
from ..ops import schedule as S


def make_ddim_sampler(
    model: AVDiffusionModel,
    *,
    target: str,  # "audio" (v2a) or "video" (a2v)
    sched: np.ndarray,  # [S+1] ints from make_sampling_schedule
    alpha_bar: np.ndarray,  # [T] for the TARGET modality
    guidance_scale: float,
    eta: float = 0.0,
    param: str = "eps",
    sampler: str = "ddim",
    cfg_rescale: float = 0.0,
    sync_guidance_scale: float = 0.0,
    sync_guidance_source: str = "auto",  # auto|mouth|video
    sync_tau: float = 0.1,
    sync_guidance_norm: str = "rms",  # rms|raw
    sync_guidance_min_abar: float = 0.0,
):
    """Returns sample(params, z_prompt, z_init, rng, tok_mouth) -> final
    target latent.

    z_prompt: clean prompt latent (video latent if target=="audio", else
    audio latent).  z_init: N(0, I) target latent.  Everything shape-static.

    `param` is the TARGET modality's prediction parameterization (the CFG
    combine g*(cond-null)+null is linear, so it applies in any of the three
    spaces; S.ddim_step converts to the (x0, eps) pair).

    `tok_mouth` (v2a with conditioning.mouth_crop enabled): raw mouth-crop
    tokens from model.mouth_tokens(frames), constant across steps so hoisted
    out of the scan with the prompt; zeroed on the null half like the
    prompt.  For a2v with the stream enabled, zero tokens are injected so
    the sequence layout matches training's dropped-mouth state.

    `sampler`: "ddim" (reference parity) or "dpmpp_2m" (DPM-Solver++(2M)
    multistep ODE solver — ~2x fewer steps at matched quality; the x0/h
    multistep state rides the same scan carry; deterministic, so eta must
    be 0).

    `sync_guidance_scale` (v2a only): classifier guidance from the model's
    OWN trained sync pathway — at each step the gradient of the temporal
    InfoNCE (train/losses.sync_contrastive_loss) between the conditioning
    video/mouth features and the current noisy-audio features w.r.t. the
    audio latent is added to eps-hat, steering the trajectory toward
    audio whose envelope FOLLOWS the mouth in time.  This is the
    pre-declared inference-side timing lever (ROADMAP r5 #3): the r4/r5
    attribution campaign showed the TRAINING-side mouth-sync objective
    converges on train yet anti-correlates with held-out timing late in
    training, while the v4 CFG sweep showed sampling-time guidance moves
    timing gaps — so the lever belongs at inference.  The gradient is
    per-sample RMS-normalized (InfoNCE gradient magnitude varies by
    orders of magnitude across t) and scaled by sqrt(1-abar_t) like a
    classifier-guidance score.  Costs one extra fwd+bwd per step, ~2.5x
    step time; 0.0 (default) compiles it away entirely.
    `sync_guidance_source`: which trained feature stream carries timing —
    "mouth" (16 Hz mouth tokens; needs conditioning.mouth_crop + frames),
    "video" (main latent grid, ~2.7 Hz), or "auto" (mouth when available).
    """
    if target not in {"audio", "video"}:
        raise ValueError("target must be 'audio' or 'video'")
    if sampler not in {"ddim", "dpmpp_2m"}:
        raise ValueError(f"sampler must be ddim|dpmpp_2m, got {sampler!r}")
    if sampler == "dpmpp_2m" and eta > 0.0:
        raise ValueError("dpmpp_2m is a deterministic ODE solver; "
                         "sampling.ddim_eta must be 0")
    sync_g = float(sync_guidance_scale)
    if sync_g > 0.0 and target != "audio":
        raise ValueError("sync_guidance_scale is a v2a (audio-target) "
                         "lever; build the a2v sampler with 0")
    if sync_g > 0.0 and param not in {"eps", "x0", "v"}:
        raise ValueError(f"sync guidance: unknown param {param!r}")
    if sync_guidance_source not in {"auto", "mouth", "video"}:
        raise ValueError(f"sync_guidance_source must be auto|mouth|video, "
                         f"got {sync_guidance_source!r}")
    if sync_guidance_norm not in {"rms", "raw"}:
        raise ValueError(f"sync_guidance_norm must be rms|raw, "
                         f"got {sync_guidance_norm!r}")
    sched_pairs = jnp.stack(
        [jnp.asarray(sched[:-1], jnp.int32), jnp.asarray(sched[1:], jnp.int32)],
        axis=1,
    )  # [S, 2] (t_now, t_prev)
    abar = jnp.asarray(alpha_bar, jnp.float32)
    g = float(guidance_scale)
    phi = float(cfg_rescale)

    def sample(params, z_prompt: jnp.ndarray, z_init: jnp.ndarray,
               rng: Optional[jax.Array] = None,
               tok_mouth: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B = z_init.shape[0]
        var = {"params": params}

        # Hoist the frozen prompt's raw tokens out of the scan.
        if target == "audio":
            tok_prompt = model.apply(var, z_prompt, method=model.tokenize_video)
            t, h, w = model.cfg.tube
            grid = (z_prompt.shape[2] // t, z_prompt.shape[3] // h,
                    z_prompt.shape[4] // w)
            T_frames = z_prompt.shape[2] * model.cfg.vae.t_down
        else:
            tok_prompt = model.apply(var, z_prompt, method=model.tokenize_audio)
            t, h, w = model.cfg.tube
            grid = (z_init.shape[2] // t, z_init.shape[3] // h,
                    z_init.shape[4] // w)
            T_frames = z_init.shape[2] * model.cfg.vae.t_down
        tok_prompt2 = jnp.concatenate([tok_prompt, tok_prompt], axis=0)

        # CFG keep-masks: first half = cond (keep prompt), second = null.
        keep_prompt = jnp.concatenate(
            [jnp.ones((B,), jnp.float32), jnp.zeros((B,), jnp.float32)]
        )
        keep_target = jnp.ones((2 * B,), jnp.float32)
        t_zero = jnp.zeros((2 * B,), jnp.int32)

        mouth_kw = {}
        have_mouth = model.cfg.mouth_enabled and tok_mouth is not None
        mgrid = None
        if model.cfg.mouth_enabled:
            mt, mh, mw = model.cfg.mouth_tube
            ch, cw = model.cfg.mouth_crop_hw
            mgrid = (T_frames // mt, ch // mh, cw // mw)
            Nm = mgrid[0] * mgrid[1] * mgrid[2]
            if tok_mouth is None:
                # a2v (or v2a without frames): zero tokens = the trained
                # dropped-mouth state, keeping the sequence layout identical
                tok_mouth = jnp.zeros(
                    (B, Nm, model.cfg.token_dim_mouth), jnp.float32)
                keep_m2 = jnp.zeros((2 * B,), jnp.float32)
            else:
                keep_m2 = keep_prompt
            mouth_kw = {
                "tok_m": jnp.concatenate([tok_mouth, tok_mouth], axis=0),
                "keep_m": keep_m2,
                "mouth_grid": mgrid,
            }

        sync_src = sync_guidance_source
        if sync_src == "auto":
            sync_src = "mouth" if have_mouth else "video"
        if sync_g > 0.0 and sync_src == "mouth" and not have_mouth:
            raise ValueError(
                "sync_guidance_source: mouth needs conditioning.mouth_crop "
                "enabled AND frames (tok_mouth) at the call site")

        if rng is None:
            rng = jax.random.PRNGKey(0)

        def step(carry, tt):
            z, key, x0_prev, h_prev = carry
            t_now, t_prev = tt[0], tt[1]
            t_tgt = jnp.full((2 * B,), t_now, jnp.int32)

            if target == "audio":
                tok_tgt = model.apply(var, z, method=model.tokenize_audio)
                tok_tgt2 = jnp.concatenate([tok_tgt, tok_tgt], axis=0)
                out = model.apply(
                    var, tok_prompt2, tok_tgt2, t_zero, t_tgt, grid,
                    keep_prompt, keep_target, True,
                    method=model.denoise_tokens, **mouth_kw,
                )
                eps_tok = out["eps_a"]
            else:
                tok_tgt = model.apply(var, z, method=model.tokenize_video)
                tok_tgt2 = jnp.concatenate([tok_tgt, tok_tgt], axis=0)
                out = model.apply(
                    var, tok_tgt2, tok_prompt2, t_tgt, t_zero, grid,
                    keep_target, keep_prompt, True,
                    method=model.denoise_tokens, **mouth_kw,
                )
                eps_tok = out["eps_v"]

            eps_cond, eps_null = eps_tok[:B], eps_tok[B:]
            eps_hat_tok = eps_null + g * (eps_cond - eps_null)
            if phi > 0.0:
                # CFG rescale (Lin et al. 2023): the linear combine inflates
                # the prediction's per-sample std by ~g, which at the high
                # guidance the AV specificity operating point needs (g >= 5)
                # over-saturates the output.  Rescale toward eps_cond's std
                # and blend by phi; phi=0 is the plain combine.
                ax = tuple(range(1, eps_hat_tok.ndim))
                s_cond = jnp.std(eps_cond, axis=ax, keepdims=True)
                s_hat = jnp.std(eps_hat_tok, axis=ax, keepdims=True)
                rescaled = eps_hat_tok * (s_cond / jnp.maximum(s_hat, 1e-12))
                eps_hat_tok = phi * rescaled + (1.0 - phi) * eps_hat_tok

            if target == "audio":
                eps_lat = model.apply(var, eps_hat_tok, z.shape,
                                      method=model.untokenize_audio)
            else:
                eps_lat = model.apply(var, eps_hat_tok, z.shape,
                                      method=model.untokenize_video)

            if sync_g > 0.0:
                # classifier guidance on the model's own sync pathway:
                # eps' = eps - sqrt(1-abar_t) * grad_z log p(sync|z)
                #      = eps + sqrt(1-abar_t) * grad_z InfoNCE(z)
                onesB = jnp.ones((B,), jnp.float32)
                tzB = jnp.zeros((B,), jnp.int32)
                t_tgtB = jnp.full((B,), t_now, jnp.int32)
                kw1 = {}
                if model.cfg.mouth_enabled:
                    kw1 = {"tok_m": tok_mouth,
                           "keep_m": onesB if have_mouth
                           else jnp.zeros((B,), jnp.float32),
                           "mouth_grid": mgrid}

                def sync_loss_of(z_x):
                    from ..train.losses import sync_contrastive_loss

                    tok_t = model.apply(var, z_x,
                                        method=model.tokenize_audio)
                    out1 = model.apply(
                        var, tok_prompt, tok_t, tzB, t_tgtB, grid,
                        onesB, onesB, True,
                        method=model.denoise_tokens, **kw1)
                    if sync_src == "mouth":
                        h_sync, chunks = out1["h_m"], mgrid[0]
                    else:
                        h_sync, chunks = out1["h_v"], grid[0]
                    return sync_contrastive_loss(
                        h_sync, out1["h_a"], chunks, weight=1.0,
                        tau=sync_tau)

                grad_sync = jax.grad(sync_loss_of)(z)
                if sync_guidance_norm == "rms":
                    # per-sample RMS normalization: sync_g acts as a fixed
                    # fraction of the eps update.  MEASURED CAVEAT
                    # (docs/sync_guide_r5/): this injects an eps-scale
                    # perturbation even at steps where the sync gradient
                    # is uninformative noise — at s>=1 the content cost
                    # (gap_logmel) is scale-insensitive (~-0.43) while
                    # timing moves; prefer small scales or norm="raw".
                    ax = tuple(range(1, z.ndim))
                    rms = jnp.sqrt(
                        jnp.mean(jnp.square(grad_sync), axis=ax,
                                 keepdims=True) + 1e-12)
                    grad_sync = grad_sync / rms
                # norm="raw": use the gradient as-is — its magnitude IS the
                # informativeness signal (large only where the sync score
                # has a real slope), so uninformative steps inject ~nothing
                a_t = abar[t_now]
                coef = jnp.sqrt(jnp.maximum(1.0 - a_t, 0.0))
                # the score term lives in eps space; convert the increment
                # to the model's output parameterization (z held fixed):
                #   d(x0)/d(eps) = -sqrt(1-abar)/sqrt(abar)
                #   d(v)/d(eps)  = 1/sqrt(abar)
                if param == "x0":
                    k = -coef / jnp.sqrt(jnp.maximum(a_t, 1e-12))
                elif param == "v":
                    k = 1.0 / jnp.sqrt(jnp.maximum(a_t, 1e-12))
                else:
                    k = 1.0
                # Late-step gate (sync_guidance_min_abar): under the x0/v
                # parameterizations the eps->pred conversion k ~ 1/sqrt(abar)
                # explodes at the earliest steps (abar ~ 1e-4 -> ~100x), so
                # an RMS-normalized injection there randomizes the
                # trajectory start and destroys content at ANY scale — the
                # measured scale-INSENSITIVE gap_logmel ~ -0.43 across
                # s in {0.5, 1, 2, 4} (docs/sync_guide_r5/).  Timing is a
                # late-stage refinement: gate the score to steps where the
                # audio has formed (abar_t above the threshold).
                if sync_guidance_min_abar > 0.0:
                    k = k * (a_t >= sync_guidance_min_abar).astype(
                        jnp.float32)
                eps_lat = eps_lat + k * sync_g * coef * grad_sync

            key, sub = jax.random.split(key)
            tb = jnp.full((B,), t_now, jnp.int32)
            pb = jnp.full((B,), t_prev, jnp.int32)
            if sampler == "dpmpp_2m":
                z_next, x0_prev, h_prev = S.dpmpp_2m_step(
                    z, tb, pb, eps_lat, abar, x0_prev, h_prev, param=param)
            elif eta > 0.0:
                noise = jax.random.normal(sub, z.shape, jnp.float32)
                z_next = S.ddim_step(z, tb, pb, eps_lat, abar, eta=eta,
                                     noise=noise, param=param)
            else:
                z_next = S.ddim_step(z, tb, pb, eps_lat, abar, eta=0.0,
                                     param=param)
            return (z_next, key, x0_prev, h_prev), None

        # dpmpp_2m multistep state (ignored and DCE'd under ddim):
        # h_prev <= 0 signals "no previous step"
        x0_0 = jnp.zeros_like(z_init, jnp.float32)
        h_0 = jnp.zeros((z_init.shape[0],) + (1,) * (z_init.ndim - 1),
                        jnp.float32)
        (z_final, _, _, _), _ = jax.lax.scan(
            step, (z_init, rng, x0_0, h_0), sched_pairs)
        return z_final

    return sample


def sampler_from_config(
    model: AVDiffusionModel, cfg: Dict, target: str
) -> Tuple[callable, np.ndarray]:
    """Build the jitted sampler for one direction from the merged YAML tree
    (keys: diffusion.{video,audio}.{steps,sampler_steps,schedule,min_beta,
    max_beta}, sampling.{ddim_eta,guidance_scale} — reference
    sample_clip.py:241-278)."""
    dc = cfg["diffusion"][target]
    T_train = int(dc["steps"])
    S_steps = int(dc["sampler_steps"])
    betas = S.make_beta_schedule(
        T_train, dc["schedule"], float(dc["min_beta"]), float(dc["max_beta"])
    )
    _, abar = S.alphas_cumprod_from_betas(betas)
    sched = S.make_sampling_schedule(T_train, S_steps)
    guide = float(cfg["sampling"]["guidance_scale"].get(target, 3.0))
    rescale = float(cfg["sampling"].get("cfg_rescale", 0.0))
    eta = float(cfg["sampling"].get("ddim_eta", 0.0))
    sampler = str(cfg["sampling"].get("sampler", "ddim"))
    # sync guidance is an audio-target (v2a) lever; a shared config builds
    # the a2v direction without it rather than erroring
    sync_g = (float(cfg["sampling"].get("sync_guidance_scale", 0.0))
              if target == "audio" else 0.0)
    sample = make_ddim_sampler(
        model, target=target, sched=sched, alpha_bar=abar,
        guidance_scale=guide, eta=eta, param=str(dc.get("param", "eps")),
        sampler=sampler, cfg_rescale=rescale,
        sync_guidance_scale=sync_g,
        sync_guidance_source=str(
            cfg["sampling"].get("sync_guidance_source", "auto")),
        sync_tau=float(cfg["sampling"].get("sync_tau", 0.1)),
        sync_guidance_norm=str(
            cfg["sampling"].get("sync_guidance_norm", "rms")),
        sync_guidance_min_abar=float(
            cfg["sampling"].get("sync_guidance_min_abar", 0.0)),
    )
    return jax.jit(sample), sched
