"""Training losses (jit-friendly).

Parity with reference `avdiff/models/train/losses.py`:
  * mse_targets_only (losses.py:13-28) — eps-MSE on the *target* modality
    only.  The reference branches on a Python string; here the selector is a
    traced 0/1 scalar so one compiled train step serves both targets without
    recompilation (TPU/XLA: no data-dependent Python control flow).
  * alignment_loss (losses.py:31-59) — cosine or L2 between mean-pooled
    per-modality contextualized features, weight-gated.

Improvement over the reference (defect SURVEY §2.12.8): both losses accept
optional per-sample validity masks (`has_video`/`has_audio` from collate) so
zero-filled missing-modality samples don't pollute the gradient.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mse(pred: jnp.ndarray, true: jnp.ndarray,
                sample_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    err = jnp.square(pred.astype(jnp.float32) - true.astype(jnp.float32))
    if sample_mask is None:
        return jnp.mean(err)
    m = sample_mask.astype(jnp.float32)  # [B]
    per_sample = jnp.mean(err.reshape(err.shape[0], -1), axis=-1)
    return jnp.sum(per_sample * m) / jnp.clip(jnp.sum(m), 1.0, None)


def mse_targets_only(
    eps_hat_v: jnp.ndarray,
    eps_hat_a: jnp.ndarray,
    eps_true_v: jnp.ndarray,
    eps_true_a: jnp.ndarray,
    target_is_video: jnp.ndarray,  # scalar 0/1 (traced)
    has_video: Optional[jnp.ndarray] = None,  # [B] bool
    has_audio: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    w = target_is_video.astype(jnp.float32)
    loss_v = _masked_mse(eps_hat_v, eps_true_v, has_video)
    loss_a = _masked_mse(eps_hat_a, eps_true_a, has_audio)
    return w * loss_v + (1.0 - w) * loss_a


def alignment_loss(
    h_video: jnp.ndarray,  # [B, Nv, d]
    h_audio: jnp.ndarray,  # [B, Na, d]
    weight: float = 0.0,
    method: str = "cosine",
) -> jnp.ndarray:
    """`weight` is a static float: weight == 0 compiles to a constant 0."""
    if weight <= 0.0:
        return jnp.asarray(0.0, jnp.float32)
    v = jnp.mean(h_video.astype(jnp.float32), axis=1)
    a = jnp.mean(h_audio.astype(jnp.float32), axis=1)
    if method == "cosine":
        v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12, None)
        a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12, None)
        loss = 1.0 - jnp.mean(jnp.sum(v * a, axis=-1))
    elif method == "l2":
        loss = jnp.mean(jnp.square(v - a))
    else:
        raise ValueError("Unknown alignment method")
    return weight * loss


def sync_contrastive_loss(
    h_video: jnp.ndarray,  # [B, Nv, d] contextualized video tokens
    h_audio: jnp.ndarray,  # [B, Na, d] contextualized audio tokens
    video_time_chunks: int,  # temporal extent of the video token grid
    weight: float = 0.0,
    tau: float = 0.1,
    sample_weight: Optional[jnp.ndarray] = None,  # [B] per-sample gate
) -> jnp.ndarray:
    """Temporal InfoNCE between per-time video and audio features
    (config `training.sync_loss_weight`; default 0.0 = off).

    Why: `alignment_loss` mean-pools over TIME, so it can only teach
    "this face goes with this voice" — never "the audio envelope follows
    the mouth NOW".  The round-3 specificity-v3 result isolated exactly
    that failure: spectral (content) specificity emerges while the
    envelope-correlation gap stays at zero (PERFORMANCE.md "Specificity
    v3").  This term supervises the "when" pathway directly, SyncNet /
    AVE-Net style, but on the denoiser's own contextualized features so
    the gradient shapes the representation the sampler actually uses.

    Both token streams are bucketed to a common temporal length T*
    (video: spatial mean per time chunk, then proportional time buckets;
    audio: proportional time buckets), L2-normalized, and scored
    [B, T*, T*] within each clip.  T* = min(video chunks, Na) — so a
    16 Hz stream (training.sync_loss_source: mouth) is supervised at
    ~80 ms granularity instead of the main video grid's ~375 ms.
    Audio bucket boundaries are PROPORTIONAL (token i -> bucket
    floor(i*Tg/Na)) rather than `Na // Tg`-sized: truncating the
    remainder would drop the tail tokens and time-compress the audio
    axis, skewing every positive pair ~100 ms late at mvp shapes
    (Na=37, Tg=6) — on the phoneme timescale this loss exists to teach.
    When Na % Tg == 0 the two schemes coincide.
    Positives are the matching time bucket; negatives are the SAME
    clip's other time positions — speaker identity/timbre is useless
    for telling them apart, so the only way to lower this loss is
    temporal correspondence.  Symmetric v->a / a->v cross-entropy.

    Static shapes throughout (reshape/mean/einsum only) — one compiled
    step regardless of weight; weight == 0 compiles to a constant.
    """
    if weight <= 0.0:
        return jnp.asarray(0.0, jnp.float32)
    import numpy as np

    B, Nv, d = h_video.shape
    Na = h_audio.shape[1]
    # video stream: tokens are TIME-MAJOR (time, spatial...) — group the
    # true temporal extent first, spatial-mean within each time position
    Tv = max(1, min(int(video_time_chunks), Nv))
    S = Nv // Tv
    v = jnp.mean(
        h_video[:, : Tv * S, :].astype(jnp.float32).reshape(B, Tv, S, d),
        axis=2)                                   # [B, Tv, d]
    # common grid: proportional bucketing of BOTH streams to Tg positions
    # (token i -> bucket floor(i*Tg/N); when N == Tg the matrix is the
    # identity, so the historical Tv==Tg path is bit-identical).  Static
    # shapes: the [Tg, N] averaging matrices fold into the compiled
    # program as constants.
    Tg = max(1, min(Tv, Na))

    def bucket_matrix(n: int) -> np.ndarray:
        bucket = (np.arange(n) * Tg) // n
        M = np.zeros((Tg, n), np.float32)
        M[bucket, np.arange(n)] = 1.0
        return M / M.sum(axis=1, keepdims=True)

    v = jnp.einsum("ts,bsd->btd", jnp.asarray(bucket_matrix(Tv)), v)
    a = jnp.einsum("ts,bsd->btd", jnp.asarray(bucket_matrix(Na)),
                   h_audio.astype(jnp.float32))
    v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12, None)
    a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12, None)
    logits = jnp.einsum("btd,bsd->bts", v, a) / tau  # [B, Tg, Tg]
    lse_va = jax.nn.logsumexp(logits, axis=2)  # v row vs all audio times
    lse_av = jax.nn.logsumexp(logits, axis=1)  # a col vs all video times
    pos = jnp.diagonal(logits, axis1=1, axis2=2)  # [B, Tg]
    per_sample = jnp.mean(lse_va - pos, axis=1) + jnp.mean(lse_av - pos,
                                                           axis=1)  # [B]
    if sample_weight is None:
        loss = jnp.mean(per_sample)
    else:
        # per-sample gating (e.g. keep_m when syncing on the mouth stream:
        # a CFG-dropped or target-side stream carries no timing — its
        # InfoNCE term is pure gradient noise)
        w = sample_weight.astype(jnp.float32)
        loss = jnp.sum(per_sample * w) / jnp.clip(jnp.sum(w), 1e-6, None)
    return weight * 0.5 * loss


def reconstruction_loss(
    recon_v: jnp.ndarray,  # [B, 3, T, H, W] decoded video
    video: jnp.ndarray,
    recon_a: jnp.ndarray,  # [B, 1, L] decoded audio
    audio: jnp.ndarray,
    weight: float = 0.0,
    has_video: Optional[jnp.ndarray] = None,
    has_audio: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Auxiliary autoencoder reconstruction MSE (config
    `training.recon_loss_weight`, default 0.0 = reference semantics).

    Neither this framework's reference parity path nor the reference itself
    puts the DECODERS in the training graph (the diffusion loss stops at
    encode -> q_sample -> eps), so sampling decodes through init-random
    weights.  This term trains both decoders end-to-end; it also anchors
    the latent scale, which matters under x0-prediction where a free
    encoder could shrink latents to make the x0 target trivially
    predictable."""
    if weight <= 0.0:
        return jnp.asarray(0.0, jnp.float32)
    # codec decode length is Fa * hop, which can differ from L by a partial
    # hop; compare over the common prefix
    L = min(recon_a.shape[-1], audio.shape[-1])
    loss_v = _masked_mse(recon_v, video, has_video)
    loss_a = _masked_mse(recon_a[..., :L], audio[..., :L], has_audio)
    return weight * (loss_v + loss_a)
