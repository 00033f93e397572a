"""Shape + semantics tests for the Flax model stack (parity with the
reference tests/test_shapes.py coverage, extended per SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.models.adapters import (
    LinearAdapter,
    ModalityEmbedding,
    PositionalEmbedding1D,
    PositionalEmbedding3D,
    TimestepEmbedder,
)
from multimodal_diffusion_tpu.models.audio_codec import AudioCodec, AudioCodecConfig
from multimodal_diffusion_tpu.models.heads import MultiModalNoiseHead, NoisePredictionHead
from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig, RMSNorm
from multimodal_diffusion_tpu.models.vae_video3d import VideoVAE, VideoVAEConfig

KEY = jax.random.PRNGKey(0)

SMALL_CORE = MMDiTConfig(d_model=64, n_layers=2, n_heads=4, mlp_ratio=2.0,
                         dropout=0.0)


def test_rmsnorm_matches_reference_formula():
    x = jax.random.normal(KEY, (2, 5, 16))
    m = RMSNorm()
    params = m.init(KEY, x)
    y = m.apply(params, x)
    xf = np.asarray(x)
    norm = np.sqrt((xf**2).mean(-1, keepdims=True))
    expect = xf / (norm + 1e-6)  # scale initialized to 1
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-6)


def test_mmdit_forward_shape_and_mask():
    x = jax.random.normal(KEY, (2, 133, 64))
    m = MMDiT(SMALL_CORE)
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 133, 64)
    # padded keys must not influence non-pad outputs
    mask = jnp.zeros((2, 133), bool).at[:, 100:].set(True)
    y1 = m.apply(params, x, mask)
    x2 = x.at[:, 100:, :].set(123.0)  # perturb only padded positions
    y2 = m.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(y1[:, :100]), np.asarray(y2[:, :100]),
                               rtol=1e-4, atol=1e-5)


def test_mmdit_token_dropout_train_mode():
    cfg = MMDiTConfig(d_model=32, n_layers=1, n_heads=2, token_dropout=0.5,
                      dropout=0.0)
    x = jnp.ones((4, 10, 32))
    m = MMDiT(cfg)
    params = m.init(KEY, x)
    y_det = m.apply(params, x, None, True)
    y_trn = m.apply(params, x, None, False, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y_det), np.asarray(y_trn))


@pytest.mark.slow
def test_mmdit_attn_dropout_train_mode():
    """attn_dropout drops attention PROBABILITIES at train time (reference
    nn.MultiheadAttention semantics, mmdt.py:51-61) — it used to be parsed
    and silently ignored.  Inference must be unaffected and rng-dependent
    at train time."""
    cfg = MMDiTConfig(d_model=32, n_layers=1, n_heads=2, dropout=0.0,
                      attn_dropout=0.5)
    x = jax.random.normal(KEY, (2, 10, 32))
    m = MMDiT(cfg)
    params = m.init(KEY, x)
    y_det = m.apply(params, x, None, True)
    y_t1 = m.apply(params, x, None, False,
                   rngs={"dropout": jax.random.PRNGKey(3)})
    y_t2 = m.apply(params, x, None, False,
                   rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(y_det), np.asarray(y_t1))
    assert not np.allclose(np.asarray(y_t1), np.asarray(y_t2))
    # the zero-dropout config is untouched: train == eval
    cfg0 = MMDiTConfig(d_model=32, n_layers=1, n_heads=2, dropout=0.0,
                       attn_dropout=0.0)
    m0 = MMDiT(cfg0)
    p0 = m0.init(KEY, x)
    np.testing.assert_allclose(
        np.asarray(m0.apply(p0, x, None, True)),
        np.asarray(m0.apply(p0, x, None, False,
                            rngs={"dropout": jax.random.PRNGKey(3)})),
        rtol=1e-6, atol=1e-6)


def test_mmdit_rope_runs():
    cfg = MMDiTConfig(d_model=32, n_layers=1, n_heads=2, rope=True, dropout=0.0)
    x = jax.random.normal(KEY, (1, 12, 32))
    m = MMDiT(cfg)
    y = m.apply(m.init(KEY, x), x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_noise_heads_shapes():
    # distinct Nv=96 / Na=37 like reference test_shapes.py:79-107
    hv = jax.random.normal(KEY, (2, 96, 64))
    ha = jax.random.normal(KEY, (2, 37, 64))
    head = MultiModalNoiseHead(output_dims={"video": 256, "audio": 32},
                               hidden_dim=64, dropout=0.0)
    params = head.init(KEY, {"video": hv, "audio": ha})
    out = head.apply(params, {"video": hv, "audio": ha})
    assert out["video"].shape == (2, 96, 256)
    assert out["audio"].shape == (2, 37, 32)
    # single-modality call works with the same params
    out_v = head.apply(params, {"video": hv})
    assert set(out_v) == {"video"}

    single = NoisePredictionHead(output_dim=8, hidden_dim=16, num_layers=2,
                                 dropout=0.0)
    p2 = single.init(KEY, hv)
    assert single.apply(p2, hv).shape == (2, 96, 8)


def test_shared_parameters_head():
    hv = jax.random.normal(KEY, (1, 4, 16))
    head = MultiModalNoiseHead(output_dims={"video": 8, "audio": 4},
                               hidden_dim=16, dropout=0.0,
                               num_modality_specific_layers=2,
                               share_parameters=True)
    params = head.init(KEY, {"video": hv, "audio": hv})
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("spec_shared_0" in n for n in names)
    assert not any("spec_video_0" in n for n in names)


@pytest.mark.slow
def test_video_vae_shapes():
    cfg = VideoVAEConfig(lat_ch=8, t_down=4, s_down=8, enc_base=16, dec_base=16,
                         enc_blocks=1, dec_blocks=1)
    vae = VideoVAE(cfg)
    x = jax.random.uniform(KEY, (1, 3, 8, 32, 32))
    params = vae.init(KEY, x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 8, 2, 4, 4)
    xr = vae.apply(params, z, method=vae.decode)
    assert xr.shape == x.shape
    assert float(jnp.min(xr)) >= 0.0 and float(jnp.max(xr)) <= 1.0  # sigmoid


@pytest.mark.slow
def test_video_vae_center_crop():
    cfg = VideoVAEConfig(lat_ch=4, t_down=4, s_down=8, enc_base=8, dec_base=8,
                         enc_blocks=1, dec_blocks=1)
    vae = VideoVAE(cfg)
    x = jax.random.uniform(KEY, (1, 3, 10, 33, 33))  # non-divisible
    params = vae.init(KEY, jax.random.uniform(KEY, (1, 3, 8, 32, 32)))
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 4, 2, 4, 4)  # cropped to (8, 32, 32)


def test_video_vae_variational():
    cfg = VideoVAEConfig(lat_ch=4, t_down=2, s_down=4, enc_base=8, dec_base=8,
                         enc_blocks=1, dec_blocks=1, variational=True)
    vae = VideoVAE(cfg)
    x = jax.random.uniform(KEY, (1, 3, 4, 16, 16))
    params = vae.init(KEY, x)
    z_mean, kld = vae.apply(params, x, None, method=vae.encode_with_kld)
    z_samp, kld2 = vae.apply(params, x, jax.random.PRNGKey(9),
                             method=vae.encode_with_kld)
    assert kld is not None and float(kld) >= -1e-6
    assert z_mean.shape == z_samp.shape == (1, 4, 2, 4, 4)
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_samp))


def test_audio_codec_shapes():
    cfg = AudioCodecConfig(lat_ch=8, hidden=16, frames_per_clip=150)
    codec = AudioCodec(cfg)
    wav = jax.random.uniform(KEY, (2, 1, 48000), minval=-1, maxval=1)
    params = codec.init(KEY, wav)
    z = codec.apply(params, wav, method=codec.encode)
    assert z.shape == (2, 8, 150)
    y = codec.apply(params, z, method=codec.decode)
    assert y.shape == (2, 1, 150 * 320)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh


@pytest.mark.slow
def test_audio_codec_free_running_frames():
    """Without frames_per_clip: Fa = ceil(L / hop) (reference 159-180)."""
    cfg = AudioCodecConfig(lat_ch=4, hidden=8, frames_per_clip=None,
                           hop_samples=320)
    codec = AudioCodec(cfg)
    wav = jnp.zeros((1, 1, 48001))
    params = codec.init(KEY, jnp.zeros((1, 1, 48001)))
    z = codec.apply(params, wav, method=codec.encode)
    assert z.shape == (1, 4, int(np.ceil(48001 / 320)))


def test_audio_codec_config_hop_from_ms():
    cfg = AudioCodecConfig.from_dict(
        {"sr": 16000, "latent": {"channels": 8, "frame_hop_ms": 20,
                                 "frames_per_clip": 150}}
    )
    assert cfg.hop_samples == 320 and cfg.frames_per_clip == 150


@pytest.mark.slow
def test_adapters():
    x = jax.random.normal(KEY, (2, 7, 12))
    a = LinearAdapter(32)
    y = a.apply(a.init(KEY, x), x)
    assert y.shape == (2, 7, 32)

    me = ModalityEmbedding(32)
    p = me.init(KEY, y, "video")
    yv = me.apply(p, y, "video")
    ya = me.apply(p, y, "audio")
    assert yv.shape == y.shape and not np.allclose(np.asarray(yv), np.asarray(ya))

    p1 = PositionalEmbedding1D(32, max_len=64)
    pe = p1.apply(p1.init(KEY, 10), 10)
    assert pe.shape == (1, 10, 32)

    p3 = PositionalEmbedding3D(32, max_t=8, max_h=8, max_w=8)
    pe3 = p3.apply(p3.init(KEY, 2, 3, 4), 2, 3, 4)
    assert pe3.shape == (1, 24, 32)

    te = TimestepEmbedder(dim=16, mode="mlp")
    emb = te.apply(te.init(KEY, jnp.array([5])), jnp.array([5, 7]))
    assert emb.shape == (2, 16)


def test_mmdit_seq_multiple_padding_parity():
    """seq_multiple pads N internally (masked keys, sliced outputs) — the
    result must be bit-comparable to the unpadded model with the same params."""
    import dataclasses

    x = jax.random.normal(KEY, (2, 133, 64))
    m_plain = MMDiT(SMALL_CORE)
    m_padded = MMDiT(dataclasses.replace(SMALL_CORE, seq_multiple=128))
    params = m_plain.init(KEY, x)

    y0 = m_plain.apply(params, x)
    y1 = m_padded.apply(params, x)  # pads 133 -> 256 internally
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)

    # with a caller-supplied key-padding mask on top
    mask = jnp.zeros((2, 133), bool).at[:, 100:].set(True)
    ym0 = m_plain.apply(params, x, mask)
    ym1 = m_padded.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(ym1[:, :100]), np.asarray(ym0[:, :100]),
                               rtol=1e-5, atol=1e-6)
