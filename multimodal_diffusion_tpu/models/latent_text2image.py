"""Text -> image latent diffusion with classifier-free guidance.

BASELINE.json configs #2/#3: "text->image latent diffusion 256x256: VAE
latents + CLIP conditioning, DDIM 50 steps" and "classifier-free guidance at
512x512 with batched cond/uncond forward and negative prompts".

Design: the same conditioning pattern as the AV stack — conditioning tokens
(text) are concatenated with target tokens (image-latent patches) in ONE
MMDiT sequence; CFG nulls the conditioning tokens; sampling is a single
lax.scan with the cond/negative branches stacked on the batch axis (one
fused forward per step).  Negative prompts ride the null branch: eps =
eps_neg + g * (eps_cond - eps_neg), with eps_neg computed from the negative
prompt's text tokens (empty text when none is given).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import schedule as S
from .adapters import LinearAdapter, PositionalEmbedding1D
from .heads import NoisePredictionHead
from .image_diffusion import patch_image, unpatch_image
from .mmdit import MMDiT, MMDiTConfig
from .text_encoder import TextEncoder, TextEncoderConfig, tokenize_text
from .vae_image2d import ImageVAE, ImageVAEConfig


@dataclasses.dataclass(frozen=True)
class Text2ImageConfig:
    image_size: int = 256
    patch: int = 2
    width: int = 512
    vae: ImageVAEConfig = dataclasses.field(
        default_factory=lambda: ImageVAEConfig(lat_ch=4, down=8)
    )
    text: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    core: MMDiTConfig = dataclasses.field(
        default_factory=lambda: MMDiTConfig(
            d_model=512, n_layers=8, n_heads=8, dropout=0.0
        )
    )
    steps: int = 1000
    schedule: str = "cosine"
    min_beta: float = 1e-4
    max_beta: float = 2e-2
    dtype: Any = jnp.float32

    @property
    def latent_hw(self) -> int:
        return self.image_size // self.vae.down

    @property
    def n_img_tokens(self) -> int:
        return (self.latent_hw // self.patch) ** 2

    @property
    def token_dim(self) -> int:
        return self.vae.lat_ch * self.patch * self.patch

    @classmethod
    def from_config(cls, cfg: Dict, dtype: Any = jnp.float32) -> "Text2ImageConfig":
        img = cfg["image"]
        return cls(
            image_size=int(img["size"]),
            patch=int(cfg["tokenizer"]["image"]["patch"]),
            width=int(cfg["model"]["core"]["d_model"]),
            vae=ImageVAEConfig.from_dict(img, dtype=dtype),
            text=TextEncoderConfig(
                width=int(cfg["model"]["text"].get("d_model", 256)),
                max_len=int(cfg["model"]["text"].get("max_len", 77)),
                core=MMDiTConfig.from_dict(cfg["model"]["text"], dtype=dtype),
                dtype=dtype,
            ),
            core=MMDiTConfig.from_dict(cfg["model"]["core"], dtype=dtype),
            steps=int(cfg["diffusion"]["image"]["steps"]),
            schedule=str(cfg["diffusion"]["image"].get("schedule", "cosine")),
            min_beta=float(cfg["diffusion"]["image"].get("min_beta", 1e-4)),
            max_beta=float(cfg["diffusion"]["image"].get("max_beta", 2e-2)),
            dtype=dtype,
        )


class Text2ImageModel(nn.Module):
    cfg: Text2ImageConfig

    def setup(self):
        c = self.cfg
        self.text_encoder = TextEncoder(c.text)
        self.vae = ImageVAE(c.vae)
        self.text_proj = LinearAdapter(c.width, dtype=c.dtype)
        self.img_adapter = LinearAdapter(c.width, dtype=c.dtype)
        self.pos_img = PositionalEmbedding1D(c.width, max_len=c.n_img_tokens,
                                             mode="learned", dtype=c.dtype)
        self.core = MMDiT(c.core)
        self.head = NoisePredictionHead(output_dim=c.token_dim,
                                        hidden_dim=c.width, num_layers=2,
                                        dropout=0.0, dtype=c.dtype)

    # ---------------- codec / text passthroughs ----------------

    def encode_image(self, x, rng=None):
        return self.vae.encode(x, rng)

    def decode_image(self, z):
        return self.vae.decode(z)

    def encode_text(self, ids, deterministic: bool = True):
        return self.text_encoder(ids, deterministic)

    # ---------------- denoiser ----------------

    def denoise(
        self,
        z_t: jnp.ndarray,  # [B, C, h, w] noisy latent
        t: jnp.ndarray,  # [B]
        text_tokens: jnp.ndarray,  # [B, L, d_text] encoded text
        text_pad: Optional[jnp.ndarray] = None,  # [B, L] True = PAD
        keep_text: Optional[jnp.ndarray] = None,  # [B] 0/1 CFG keep
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns eps_hat in latent shape [B, C, h, w]."""
        c = self.cfg
        tok = patch_image(z_t, c.patch)  # [B, Ni, Dtok]
        h_img = self.img_adapter(tok) + self.pos_img(tok.shape[1])
        h_img = h_img + S.timestep_embedding(t, c.width).astype(h_img.dtype)[:, None, :]
        h_txt = self.text_proj(text_tokens)
        if keep_text is not None:
            h_txt = h_txt * keep_text.astype(h_txt.dtype)[:, None, None]
        x = jnp.concatenate([h_txt, h_img], axis=1)
        mask = None
        if text_pad is not None:
            img_pad = jnp.zeros((z_t.shape[0], tok.shape[1]), bool)
            mask = jnp.concatenate([text_pad, img_pad], axis=1)
        h = self.core(x, mask, deterministic)
        eps_tok = self.head(h[:, h_txt.shape[1]:, :], deterministic)
        return unpatch_image(eps_tok, c.vae.lat_ch, c.latent_hw, c.latent_hw,
                             c.patch)

    def __call__(self, images, ids, t, noise, alpha_bar, keep_text=None,
                 deterministic: bool = True):
        """Training forward: encode -> q_sample -> denoise.  Returns
        (eps_hat, eps_true) in latent space."""
        z0 = self.encode_image(images)
        z_t, eps = S.q_sample(z0, t, alpha_bar, eps=noise)
        text_tokens, _ = self.encode_text(ids, deterministic)
        from .text_encoder import PAD_ID

        eps_hat = self.denoise(z_t, t, text_tokens, ids == PAD_ID, keep_text,
                               deterministic)
        if self.is_initializing():
            self.decode_image(z0)
        return eps_hat, eps


# ---------------------------------------------------------------------------
# training + sampling
# ---------------------------------------------------------------------------


def make_t2i_train_step(model: Text2ImageModel, tx, cfg_drop_prob: float = 0.1):
    c = model.cfg
    betas = S.make_beta_schedule(c.steps, c.schedule, c.min_beta, c.max_beta)
    _, abar = S.alphas_cumprod_from_betas(betas)
    abar = jnp.asarray(abar)
    lat = (c.vae.lat_ch, c.latent_hw, c.latent_hw)

    def step(params, opt_state, rng, images, ids):
        rng, kt, kn, kd, kdrop = jax.random.split(rng, 5)
        B = images.shape[0]
        t = jax.random.randint(kt, (B,), 0, c.steps)
        noise = jax.random.normal(kn, (B,) + lat, jnp.float32)
        keep = (jax.random.uniform(kdrop, (B,)) >= cfg_drop_prob).astype(jnp.float32)

        def loss_fn(p):
            eps_hat, eps = model.apply(
                {"params": p}, images, ids, t, noise, abar, keep, False,
                rngs={"dropout": kd},
            )
            return jnp.mean(jnp.square(
                eps_hat.astype(jnp.float32) - eps.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return step


def make_t2i_sampler(model: Text2ImageModel, sampler_steps: int = 50,
                     guidance_scale: float = 5.0, eta: float = 0.0,
                     sampler: str = "ddim"):
    """Returns sample(params, ids, neg_ids, rng, batch) -> latents.

    Batched CFG: [cond; negative] stacked on batch, one forward per step.
    `neg_ids` defaults to empty text (pure unconditional null branch);
    passing a real negative prompt steers away from it.

    `sampler`: "ddim" or "dpmpp_2m" (2nd-order multistep ODE solver —
    same step quality at roughly half the steps; deterministic, eta must
    be 0).  Same switch as the AV path (infer/ddim.py).
    """
    if sampler not in {"ddim", "dpmpp_2m"}:
        raise ValueError(f"sampler must be ddim|dpmpp_2m, got {sampler!r}")
    if sampler == "dpmpp_2m" and eta > 0.0:
        raise ValueError("dpmpp_2m is deterministic; eta must be 0")
    c = model.cfg
    betas = S.make_beta_schedule(c.steps, c.schedule, c.min_beta, c.max_beta)
    _, abar_np = S.alphas_cumprod_from_betas(betas)
    abar = jnp.asarray(abar_np)
    sched = S.make_sampling_schedule(c.steps, sampler_steps)
    pairs = jnp.stack([jnp.asarray(sched[:-1], jnp.int32),
                       jnp.asarray(sched[1:], jnp.int32)], axis=1)
    g = float(guidance_scale)
    lat = (c.vae.lat_ch, c.latent_hw, c.latent_hw)

    from .text_encoder import PAD_ID

    def sample(params, ids, neg_ids, rng):
        B = ids.shape[0]
        var = {"params": params}
        text_cond, _ = model.apply(var, ids, method=model.encode_text)
        text_neg, _ = model.apply(var, neg_ids, method=model.encode_text)
        text2 = jnp.concatenate([text_cond, text_neg], axis=0)
        pad2 = jnp.concatenate([ids == PAD_ID, neg_ids == PAD_ID], axis=0)
        # negative/empty prompt CONDITIONS the null branch (keep=1); true
        # unconditional nulling happens when neg text is empty
        keep2 = jnp.ones((2 * B,), jnp.float32)

        rng, k0 = jax.random.split(rng)
        z = jax.random.normal(k0, (B,) + lat, jnp.float32)

        def body(carry, tt):
            z, key, x0_prev, h_prev = carry
            t_now, t_prev = tt[0], tt[1]
            t2 = jnp.full((2 * B,), t_now, jnp.int32)
            z2 = jnp.concatenate([z, z], axis=0)
            eps2 = model.apply(var, z2, t2, text2, pad2, keep2, True,
                               method=model.denoise)
            eps_c, eps_n = eps2[:B], eps2[B:]
            eps_hat = eps_n + g * (eps_c - eps_n)
            key, kz = jax.random.split(key)
            tb = jnp.full((B,), t_now, jnp.int32)
            pb = jnp.full((B,), t_prev, jnp.int32)
            if sampler == "dpmpp_2m":
                z, x0_prev, h_prev = S.dpmpp_2m_step(
                    z, tb, pb, eps_hat, abar, x0_prev, h_prev)
            elif eta > 0.0:
                noise = jax.random.normal(kz, z.shape, jnp.float32)
                z = S.ddim_step(z, tb, pb, eps_hat, abar, eta=eta, noise=noise)
            else:
                z = S.ddim_step(z, tb, pb, eps_hat, abar, eta=0.0)
            return (z, key, x0_prev, h_prev), None

        x0_0 = jnp.zeros_like(z)
        h_0 = jnp.zeros((B,) + (1,) * (z.ndim - 1), jnp.float32)
        (z_final, _, _, _), _ = jax.lax.scan(body, (z, rng, x0_0, h_0), pairs)
        return z_final

    return sample


def sample_images(model: Text2ImageModel, params, prompts, negative=None,
                  sampler_steps: int = 50, guidance_scale: float = 5.0,
                  rng=None, sampler: str = "ddim") -> np.ndarray:
    """Convenience end-to-end: prompts -> uint8 images [B, H, W, 3]."""
    c = model.cfg
    ids = jnp.asarray(tokenize_text(prompts, c.text.max_len))
    neg = jnp.asarray(tokenize_text(
        negative if negative is not None else [""] * len(prompts),
        c.text.max_len,
    ))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sample = jax.jit(make_t2i_sampler(model, sampler_steps, guidance_scale,
                                      sampler=sampler))
    z = sample(params, ids, neg, rng)
    x = model.apply({"params": params}, z, method=model.decode_image)
    x = np.asarray(jax.device_get(jnp.clip(x, -1, 1)))
    return ((x.transpose(0, 2, 3, 1) + 1.0) * 127.5).astype(np.uint8)
