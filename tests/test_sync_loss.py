"""Temporal sync-contrastive loss (training.sync_loss_weight).

The alignment loss mean-pools over time and thus cannot supervise
temporal correspondence; sync_contrastive_loss is the dedicated "when"
objective (see PERFORMANCE.md "Specificity v3" for the failure it
targets).  Capability beyond the reference: the reference has no
temporal-sync objective at all (avdiff/models/train/losses.py defines
only eps-MSE and pooled alignment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.train.losses import sync_contrastive_loss

from tests._tiny import tiny_cfg


def _timed_features(key, B=2, T=8, d=16):
    """Features whose only structure is per-time identity: v[b,t] == a[b,t]
    up to noise, and time positions are mutually distinctive."""
    base = jax.random.normal(key, (B, T, d))
    return base, base + 0.01 * jax.random.normal(jax.random.fold_in(key, 1),
                                                 (B, T, d))


def test_zero_weight_is_constant_zero():
    v = jnp.ones((2, 8, 16))
    a = jnp.ones((2, 12, 16))
    out = sync_contrastive_loss(v, a, video_time_chunks=4, weight=0.0)
    assert float(out) == 0.0


def test_aligned_beats_time_shifted():
    v, a = _timed_features(jax.random.PRNGKey(0))
    aligned = sync_contrastive_loss(v, a, video_time_chunks=8, weight=1.0)
    shifted = sync_contrastive_loss(v, jnp.roll(a, 3, axis=1),
                                    video_time_chunks=8, weight=1.0)
    assert float(aligned) < float(shifted)


def test_bucketing_handles_mismatched_lengths():
    # Nv = 24 tokens over Tg=8 time chunks (3 spatial positions each),
    # Na = 50 audio frames -> 6-frame buckets with a truncated tail
    key = jax.random.PRNGKey(1)
    base, _ = _timed_features(key, B=2, T=8, d=16)
    v = jnp.repeat(base, 3, axis=1)  # [2, 24, 16]
    a = jnp.repeat(base, 7, axis=1)[:, :50, :]  # [2, 50, 16]
    aligned = sync_contrastive_loss(v, a, video_time_chunks=8, weight=1.0)
    shifted = sync_contrastive_loss(v, jnp.roll(a, 21, axis=1),
                                    video_time_chunks=8, weight=1.0)
    assert np.isfinite(float(aligned))
    assert float(aligned) < float(shifted)


def test_proportional_buckets_match_exact_reshape_when_divisible():
    # Na % Tg == 0: proportional bucketing must equal the exact
    # reshape-mean (the pre-fix scheme), so the fix changes nothing for
    # divisible shapes
    key = jax.random.PRNGKey(3)
    base, _ = _timed_features(key, B=2, T=6, d=8)
    v = jnp.repeat(base, 2, axis=1)   # [2, 12, 8]
    a = jnp.repeat(base, 4, axis=1)   # [2, 24, 8], Na=24 divisible by Tg=6
    got = sync_contrastive_loss(v, a, video_time_chunks=6, weight=1.0)
    B, Na, d = a.shape
    ref_a = jnp.mean(a.reshape(B, 6, Na // 6, d), axis=2)
    S = v.shape[1] // 6
    ref_v = jnp.mean(v.reshape(B, 6, S, d), axis=2)
    nv = ref_v / jnp.linalg.norm(ref_v, axis=-1, keepdims=True)
    na_ = ref_a / jnp.linalg.norm(ref_a, axis=-1, keepdims=True)
    logits = jnp.einsum("btd,bsd->bts", nv, na_) / 0.1
    pos = jnp.diagonal(logits, axis1=1, axis2=2)
    want = 0.5 * (jnp.mean(jax.nn.logsumexp(logits, 2) - pos)
                  + jnp.mean(jax.nn.logsumexp(logits, 1) - pos))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_proportional_buckets_cover_the_tail():
    """mvp shapes (Na=37, Tg=6): the old Na//Tg bucketing dropped token 36
    and time-compressed audio ~4% (≈100 ms of a 3 s clip).  Proportional
    buckets must keep a one-token tail signal visible in the loss and must
    prefer TRUE alignment over a 37/36 time-compressed copy."""
    B, Tg, d, Na = 1, 6, 8, 37
    key = jax.random.PRNGKey(4)
    base = jax.random.normal(key, (B, Tg, d))
    v = jnp.repeat(base, 2, axis=1)  # [1, 12, 8], S=2
    # audio token i carries the feature of its PROPORTIONAL video chunk
    idx = (np.arange(Na) * Tg) // Na
    a_true = jnp.asarray(np.asarray(base)[:, idx, :])  # [1, 37, 8]
    # time-compressed variant: token i carries chunk min(i//6, 5) — the
    # old bucketing's implied alignment (6-token buckets, tail merged)
    idx_old = np.minimum(np.arange(Na) // 6, Tg - 1)
    a_compressed = jnp.asarray(np.asarray(base)[:, idx_old, :])
    loss_true = sync_contrastive_loss(v, a_true, Tg, weight=1.0)
    loss_comp = sync_contrastive_loss(v, a_compressed, Tg, weight=1.0)
    assert float(loss_true) < float(loss_comp)


def test_gradient_flows_and_jits():
    v, a = _timed_features(jax.random.PRNGKey(2))

    @jax.jit
    def f(v, a):
        return sync_contrastive_loss(v, a, video_time_chunks=8,
                                     weight=0.5, tau=0.2)

    g = jax.grad(lambda v: f(v, a))(v)
    assert np.isfinite(float(f(v, a)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.slow
def test_trainer_reports_loss_sync():
    from multimodal_diffusion_tpu.train.trainer import create_trainer

    cfg = tiny_cfg()
    cfg["training"]["sync_loss_weight"] = 0.1
    cfg["training"]["sync_tau"] = 0.1
    # tiny default has T' = 2, tube t = 2 -> a single time chunk, where the
    # InfoNCE is trivially 0; keep full time resolution in the latent
    cfg["video"]["latent"]["t_down"] = 1
    tr = create_trainer(cfg)
    batch = {
        "video": jnp.zeros((2, 3, 8, 32, 32), jnp.float32),
        "audio": jnp.zeros((2, 1, 8000), jnp.float32),
    }
    state, metrics = tr.train_step(tr.state, batch, jnp.asarray(0.0))
    assert "loss_sync" in metrics
    assert np.isfinite(float(metrics["loss_sync"]))
    assert float(metrics["loss_sync"]) > 0.0


def test_sample_weight_gates_per_sample():
    """sample_weight excludes gated samples exactly: loss over [clip0 w=1,
    clip1 w=0] equals the loss over clip0 alone (training.sync_loss_source:
    mouth gates by keep_m — dropped streams carry no timing)."""
    v, a = _timed_features(jax.random.PRNGKey(3), B=2)
    both = sync_contrastive_loss(
        v, a, video_time_chunks=8, weight=1.0,
        sample_weight=jnp.asarray([1.0, 0.0]))
    only0 = sync_contrastive_loss(v[:1], a[:1], video_time_chunks=8,
                                  weight=1.0)
    np.testing.assert_allclose(float(both), float(only0), rtol=1e-6)
    # all-zero gate (whole batch dropped): loss is ~0, not NaN
    none = sync_contrastive_loss(
        v, a, video_time_chunks=8, weight=1.0,
        sample_weight=jnp.zeros((2,)))
    assert np.isfinite(float(none)) and abs(float(none)) < 1e-3


def test_video_chunks_exceeding_audio_tokens_keep_time_order():
    """When the video stream is FINER than the audio stream (the 16 Hz
    mouth-token case: 48 video positions vs 37 audio tokens), the video
    side must be bucketed proportionally in TIME — not regrouped by a
    spatial-size-breaking reshape.  Alignment must survive the downsample."""
    key = jax.random.PRNGKey(4)
    B, T, d, S = 2, 16, 16, 3
    base = jax.random.normal(key, (B, T, d))
    v = jnp.repeat(base, S, axis=1)              # [B, 48, d] time-major
    a = base[:, ::3, :] + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), (B, T // 3 + (1 if T % 3 else 0), d))
    # Na=6 < Tv=16: both streams bucket to Tg=6
    aligned = sync_contrastive_loss(v, a, video_time_chunks=T, weight=1.0)
    shifted = sync_contrastive_loss(v, jnp.roll(a, 2, axis=1),
                                    video_time_chunks=T, weight=1.0)
    assert np.isfinite(float(aligned))
    assert float(aligned) < float(shifted)


@pytest.mark.slow
def test_trainer_mouth_sync_source():
    """training.sync_loss_source: mouth — the InfoNCE runs on the 16 Hz
    mouth-token features, gated by keep_m; the step runs and reports a
    finite loss_sync.  A bad source or mouth-less config fails loudly."""
    import copy

    from multimodal_diffusion_tpu.train.trainer import create_trainer

    cfg = tiny_cfg()
    cfg["conditioning"] = {"mouth_crop": {
        "enabled": True, "box": [16, 32, 8, 24],
        "tube": {"t": 1, "h": 4, "w": 4}}}
    cfg["training"]["sync_loss_weight"] = 0.2
    cfg["training"]["sync_loss_source"] = "mouth"
    tr = create_trainer(cfg)
    batch = {
        "video": jnp.zeros((2, 3, 8, 32, 32), jnp.float32),
        "audio": jnp.zeros((2, 1, 8000), jnp.float32),
    }
    state, metrics = tr.train_step(tr.state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss_sync"]))

    cfg_bad = copy.deepcopy(cfg)
    cfg_bad["training"]["sync_loss_source"] = "lips"
    with pytest.raises(ValueError, match="sync_loss_source"):
        create_trainer(cfg_bad)

    cfg_nomouth = tiny_cfg()
    cfg_nomouth["training"]["sync_loss_weight"] = 0.2
    cfg_nomouth["training"]["sync_loss_source"] = "mouth"
    with pytest.raises(ValueError, match="mouth_crop"):
        create_trainer(cfg_nomouth)
