"""Text -> audio mel-spectrogram diffusion + Griffin-Lim decode.

BASELINE.json config #4: "text->audio: mel-spectrogram diffusion +
Griffin-Lim/vocoder decode (audio modality path)".

The mel spectrogram [n_mels, frames] is treated as a 1-channel image latent:
patch tokens over the shared MMDiT core with text conditioning concatenated
in-sequence, CFG via the batched dual forward — the identical machinery as
latent_text2image with a spectrogram-shaped target and a host-side
Griffin-Lim vocoder (media/audio_io.griffin_lim) at the end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..media.audio_io import griffin_lim, mel_to_stft_mag
from ..ops import schedule as S
from .adapters import LinearAdapter, PositionalEmbedding1D
from .heads import NoisePredictionHead
from .image_diffusion import patch_image, unpatch_image
from .mmdit import MMDiT, MMDiTConfig
from .text_encoder import PAD_ID, TextEncoder, TextEncoderConfig


@dataclasses.dataclass(frozen=True)
class Text2AudioConfig:
    n_mels: int = 80
    frames: int = 256  # mel time frames per sample
    patch_f: int = 8  # mel-axis patch
    patch_t: int = 8  # time-axis patch
    width: int = 384
    sr: int = 16000
    n_fft: int = 1024
    hop: int = 256
    text: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    core: MMDiTConfig = dataclasses.field(
        default_factory=lambda: MMDiTConfig(
            d_model=384, n_layers=6, n_heads=6, dropout=0.0
        )
    )
    steps: int = 1000
    schedule: str = "cosine"
    min_beta: float = 1e-4
    max_beta: float = 2e-2
    # mel normalization: z = (logmel - mean) / std before diffusion
    mel_mean: float = -5.0
    mel_std: float = 4.0
    dtype: Any = jnp.float32

    @property
    def n_tokens(self) -> int:
        return (self.n_mels // self.patch_f) * (self.frames // self.patch_t)

    @property
    def token_dim(self) -> int:
        return self.patch_f * self.patch_t


class Text2AudioModel(nn.Module):
    cfg: Text2AudioConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = TextEncoder(c.text)
        self.text_proj = LinearAdapter(c.width, dtype=c.dtype)
        self.mel_adapter = LinearAdapter(c.width, dtype=c.dtype)
        self.pos = PositionalEmbedding1D(c.width, max_len=c.n_tokens,
                                         mode="learned", dtype=c.dtype)
        self.core = MMDiT(c.core)
        self.head = NoisePredictionHead(output_dim=c.token_dim,
                                        hidden_dim=c.width, num_layers=2,
                                        dropout=0.0, dtype=c.dtype)

    def encode_text(self, ids, deterministic: bool = True):
        return self.text_encoder(ids, deterministic)

    def denoise(self, m_t: jnp.ndarray, t: jnp.ndarray,
                text_tokens: jnp.ndarray,
                text_pad: Optional[jnp.ndarray] = None,
                keep_text: Optional[jnp.ndarray] = None,
                deterministic: bool = True) -> jnp.ndarray:
        """m_t: [B, 1, n_mels, frames] noisy normalized mel -> eps_hat."""
        c = self.cfg
        tok = patch_image(m_t, c.patch_f)  # square patch over (mels, time)
        h = self.mel_adapter(tok) + self.pos(tok.shape[1])
        h = h + S.timestep_embedding(t, c.width).astype(h.dtype)[:, None, :]
        h_txt = self.text_proj(text_tokens)
        if keep_text is not None:
            h_txt = h_txt * keep_text.astype(h_txt.dtype)[:, None, None]
        x = jnp.concatenate([h_txt, h], axis=1)
        mask = None
        if text_pad is not None:
            mel_pad = jnp.zeros((m_t.shape[0], tok.shape[1]), bool)
            mask = jnp.concatenate([text_pad, mel_pad], axis=1)
        out = self.core(x, mask, deterministic)
        eps_tok = self.head(out[:, h_txt.shape[1]:, :], deterministic)
        return unpatch_image(eps_tok, 1, c.n_mels, c.frames, c.patch_f)

    def __call__(self, mels, ids, t, noise, alpha_bar, keep_text=None,
                 deterministic: bool = True):
        """Training forward on normalized mels [B, 1, M, F]."""
        m_t, eps = S.q_sample(mels, t, alpha_bar, eps=noise)
        text_tokens, _ = self.encode_text(ids, deterministic)
        eps_hat = self.denoise(m_t, t, text_tokens, ids == PAD_ID, keep_text,
                               deterministic)
        return eps_hat, eps


def make_t2a_sampler(model: Text2AudioModel, sampler_steps: int = 50,
                     guidance_scale: float = 3.0, eta: float = 0.0):
    """sample(params, ids, neg_ids, rng) -> normalized mel [B, 1, M, F]
    (one lax.scan, batched CFG like the other families)."""
    c = model.cfg
    betas = S.make_beta_schedule(c.steps, c.schedule, c.min_beta, c.max_beta)
    _, abar_np = S.alphas_cumprod_from_betas(betas)
    abar = jnp.asarray(abar_np)
    sched = S.make_sampling_schedule(c.steps, sampler_steps)
    pairs = jnp.stack([jnp.asarray(sched[:-1], jnp.int32),
                       jnp.asarray(sched[1:], jnp.int32)], axis=1)
    g = float(guidance_scale)

    def sample(params, ids, neg_ids, rng):
        B = ids.shape[0]
        var = {"params": params}
        text_c, _ = model.apply(var, ids, method=model.encode_text)
        text_n, _ = model.apply(var, neg_ids, method=model.encode_text)
        text2 = jnp.concatenate([text_c, text_n], axis=0)
        pad2 = jnp.concatenate([ids == PAD_ID, neg_ids == PAD_ID], axis=0)
        rng, k0 = jax.random.split(rng)
        m = jax.random.normal(k0, (B, 1, c.n_mels, c.frames), jnp.float32)

        def body(carry, tt):
            m, key = carry
            t_now, t_prev = tt[0], tt[1]
            m2 = jnp.concatenate([m, m], axis=0)
            t2 = jnp.full((2 * B,), t_now, jnp.int32)
            eps2 = model.apply(var, m2, t2, text2, pad2, None, True,
                               method=model.denoise)
            eps_hat = eps2[B:] + g * (eps2[:B] - eps2[B:])
            key, kz = jax.random.split(key)
            tb = jnp.full((B,), t_now, jnp.int32)
            pb = jnp.full((B,), t_prev, jnp.int32)
            if eta > 0.0:
                z = jax.random.normal(kz, m.shape, jnp.float32)
                m = S.ddim_step(m, tb, pb, eps_hat, abar, eta=eta, noise=z)
            else:
                m = S.ddim_step(m, tb, pb, eps_hat, abar, eta=0.0)
            return (m, key), None

        (m_final, _), _ = jax.lax.scan(body, (m, rng), pairs)
        return m_final

    return sample


def mel_to_waveform(model_cfg: Text2AudioConfig, mel_norm: np.ndarray,
                    n_iter: int = 32) -> np.ndarray:
    """Normalized mel [1, M, F] (or [M, F]) -> waveform via Griffin-Lim."""
    c = model_cfg
    mel = np.asarray(mel_norm)
    if mel.ndim == 3:
        mel = mel[0]
    log_mel = mel * c.mel_std + c.mel_mean  # de-normalize
    # clamp to a physical dynamic range before exp — diffusion outputs are
    # unbounded and exp() of a wild sample would overflow the vocoder
    mel_power = np.exp(np.clip(log_mel, -12.0, 8.0))
    mag = mel_to_stft_mag(mel_power, c.sr, c.n_fft, c.n_mels)
    return griffin_lim(mag, n_fft=c.n_fft, hop=c.hop, n_iter=n_iter)
