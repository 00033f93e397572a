"""Text-conditioned families: text encoder, text->image latent diffusion
(CFG + negative prompts), text->audio mel + Griffin-Lim (BASELINE configs
#2-#4), all at tiny scale on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_diffusion_tpu.models.mmdit import MMDiTConfig
from multimodal_diffusion_tpu.models.text_encoder import (
    PAD_ID, TextEncoder, TextEncoderConfig, tokenize_text,
)

TXT = TextEncoderConfig(
    width=32, max_len=16,
    core=MMDiTConfig(d_model=32, n_layers=1, n_heads=2, mlp_ratio=2.0,
                     dropout=0.0),
)


def test_tokenize_text():
    ids = tokenize_text(["hi", "a longer prompt that will be truncated"], 8)
    assert ids.shape == (2, 8)
    assert ids[0, 0] == 257 and ids[0, 3] == 258  # BOS, EOS after 'h','i'
    assert ids[0, 4] == PAD_ID
    assert (ids[1] != PAD_ID).all()  # truncated, fully used


def test_text_encoder_masks_padding():
    enc = TextEncoder(TXT)
    ids = jnp.asarray(tokenize_text(["hello"], 16))
    params = enc.init(jax.random.PRNGKey(0), ids)
    toks, pooled = enc.apply(params, ids)
    assert toks.shape == (1, 16, 32) and pooled.shape == (1, 32)
    # changing a PAD position's id to another PAD-region value shouldn't
    # change the pooled output (pads are masked)
    ids2 = ids.at[0, 12].set(65)  # 'A' in the pad region... not PAD anymore
    toks2, pooled2 = enc.apply(params, ids2)
    assert not np.allclose(np.asarray(pooled), np.asarray(pooled2))  # real token counts
    # but perturbing nothing is identity
    toks3, pooled3 = enc.apply(params, ids)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(pooled3))


@pytest.fixture(scope="module")
def t2i():
    from multimodal_diffusion_tpu.models.latent_text2image import (
        Text2ImageConfig, Text2ImageModel,
    )
    from multimodal_diffusion_tpu.models.vae_image2d import ImageVAEConfig
    from flax.core import meta

    cfg = Text2ImageConfig(
        image_size=16, patch=2, width=32,
        vae=ImageVAEConfig(lat_ch=2, down=4, base=8, max_ch=16),
        text=TXT,
        core=MMDiTConfig(d_model=32, n_layers=1, n_heads=2, mlp_ratio=2.0,
                         dropout=0.0),
        steps=20,
    )
    model = Text2ImageModel(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (2, 3, 16, 16), minval=-1, maxval=1)
    ids = jnp.asarray(tokenize_text(["a", "b"], 16))
    lat = (2, cfg.vae.lat_ch, cfg.latent_hw, cfg.latent_hw)
    from multimodal_diffusion_tpu.ops import schedule as S

    betas = S.make_beta_schedule(20, "cosine")
    _, abar = S.alphas_cumprod_from_betas(betas)
    params = meta.unbox(model.init(
        {"params": rng}, images, ids, jnp.zeros((2,), jnp.int32),
        jnp.zeros(lat, jnp.float32), jnp.asarray(abar),
    )["params"])
    return model, params, images, ids


@pytest.mark.slow
def test_t2i_train_step_runs(t2i):
    from multimodal_diffusion_tpu.models.latent_text2image import (
        make_t2i_train_step,
    )

    model, params, images, ids = t2i
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_t2i_train_step(model, tx))
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        params, opt_state, key, loss = step(params, opt_state, key, images, ids)
        losses.append(float(loss))
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_t2i_sample_with_negative_prompt(t2i):
    from multimodal_diffusion_tpu.models.latent_text2image import sample_images

    model, params, _, _ = t2i
    imgs = sample_images(model, params, ["a cat"], negative=["blurry"],
                         sampler_steps=3, guidance_scale=4.0)
    assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8
    # negative prompt changes the output vs empty negative
    imgs2 = sample_images(model, params, ["a cat"], negative=None,
                          sampler_steps=3, guidance_scale=4.0)
    assert not np.array_equal(imgs, imgs2)


@pytest.mark.slow
def test_t2a_mel_family():
    from flax.core import meta

    from multimodal_diffusion_tpu.models.text2audio_mel import (
        Text2AudioConfig, Text2AudioModel, make_t2a_sampler, mel_to_waveform,
    )
    from multimodal_diffusion_tpu.ops import schedule as S

    cfg = Text2AudioConfig(
        n_mels=16, frames=16, patch_f=4, patch_t=4, width=32, text=TXT,
        core=MMDiTConfig(d_model=32, n_layers=1, n_heads=2, mlp_ratio=2.0,
                         dropout=0.0),
        steps=10, n_fft=256, hop=64, sr=8000,
    )
    model = Text2AudioModel(cfg)
    rng = jax.random.PRNGKey(0)
    mels = jax.random.normal(rng, (2, 1, 16, 16))
    ids = jnp.asarray(tokenize_text(["drum", "hum"], 16))
    betas = S.make_beta_schedule(10, "cosine")
    _, abar = S.alphas_cumprod_from_betas(betas)
    params = meta.unbox(model.init(
        {"params": rng}, mels, ids, jnp.zeros((2,), jnp.int32),
        jnp.zeros_like(mels), jnp.asarray(abar),
    )["params"])

    sample = jax.jit(make_t2a_sampler(model, sampler_steps=3, guidance_scale=2.0))
    neg = jnp.asarray(tokenize_text(["", ""], 16))
    m = sample(params, ids, neg, jax.random.PRNGKey(1))
    assert m.shape == (2, 1, 16, 16)
    assert np.isfinite(np.asarray(m)).all()

    wav = mel_to_waveform(cfg, np.asarray(m[0]), n_iter=4)
    assert wav.ndim == 1 and np.isfinite(wav).all() and len(wav) > 0


def test_griffin_lim_reconstructs_tone():
    """Griffin-Lim from a true magnitude STFT should reconstruct a sine
    tone's envelope closely."""
    from multimodal_diffusion_tpu.media.audio_io import griffin_lim, stft_mag

    sr = 8000
    t = np.arange(4000) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mag = stft_mag(y, n_fft=512, hop=128)
    y_rec = griffin_lim(mag, n_fft=512, hop=128, n_iter=32, length=len(y))
    # compare magnitude spectra (phase-free)
    m2 = stft_mag(y_rec, n_fft=512, hop=128)
    T = min(mag.shape[1], m2.shape[1])
    # edge frames dominate the residual (boundary OLA coverage); interior
    # phase converges — 0.35 catches a broken reconstruction (err ~ 1.0)
    err = np.linalg.norm(m2[:, 2:T-2] - mag[:, 2:T-2]) / np.linalg.norm(mag[:, 2:T-2])
    assert err < 0.35, f"spectral error {err}"
    # magnitude-only recon is phase/time-shift ambiguous, so check the
    # dominant frequency instead of sample-wise correlation
    spec = np.abs(np.fft.rfft(y_rec[500:3500]))
    freq = np.fft.rfftfreq(3000, 1.0 / sr)
    assert abs(freq[int(np.argmax(spec))] - 440.0) < 10.0


@pytest.mark.slow
def test_t2i_dpmpp_sampler(t2i):
    """sampler="dpmpp_2m" on the t2i scan (same switch as the AV path):
    finite output, differs from DDIM at the same budget, eta guard."""
    from multimodal_diffusion_tpu.models.latent_text2image import (
        make_t2i_sampler, sample_images,
    )

    model, params, _, _ = t2i
    imgs_dpm = sample_images(model, params, ["a cat"], sampler_steps=4,
                             guidance_scale=4.0, sampler="dpmpp_2m")
    assert imgs_dpm.shape == (1, 16, 16, 3) and imgs_dpm.dtype == np.uint8
    imgs_ddim = sample_images(model, params, ["a cat"], sampler_steps=4,
                              guidance_scale=4.0)
    assert not np.array_equal(imgs_dpm, imgs_ddim)

    with pytest.raises(ValueError, match="deterministic"):
        make_t2i_sampler(model, 4, 4.0, eta=0.5, sampler="dpmpp_2m")
