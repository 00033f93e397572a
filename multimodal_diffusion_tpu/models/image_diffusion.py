"""Pixel-space image diffusion (DiT over patch tokens) — the CPU-runnable
reference workload from BASELINE.json config #1: "unconditional pixel-space
DDPM, 32x32 (MNIST/CIFAR), 1000-step ancestral sampler".

Reuses the framework's core machinery: MMDiT transformer, LinearAdapter,
PositionalEmbedding, fp32 schedule ops, and a scan-compiled sampler — the
image family is ~150 lines on top of the shared stack, demonstrating that
conditioning-free pixel diffusion, latent AV diffusion, and future families
(text->image latent, text->audio mel) all share one denoiser core.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import schedule as S
from ..ops.tokenize import tube_patch_video, tube_unpatch_video
from .adapters import LinearAdapter, PositionalEmbedding1D
from .heads import NoisePredictionHead
from .mmdit import MMDiT, MMDiTConfig


def patch_image(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)(W/p), C*p*p] (2-D case of tube patching)."""
    return tube_patch_video(x[:, :, None], 1, p, p)


def unpatch_image(tok: jnp.ndarray, C: int, H: int, W: int, p: int) -> jnp.ndarray:
    return tube_unpatch_video(tok, C, 1, H, W, 1, p, p)[:, :, 0]


@dataclasses.dataclass(frozen=True)
class PixelDiTConfig:
    image_size: int = 32
    channels: int = 3
    patch: int = 4
    width: int = 192
    core: MMDiTConfig = dataclasses.field(
        default_factory=lambda: MMDiTConfig(
            d_model=192, n_layers=6, n_heads=6, mlp_ratio=4.0, dropout=0.0
        )
    )
    steps: int = 1000
    schedule: str = "cosine"
    min_beta: float = 1e-4
    max_beta: float = 2e-2
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: Dict, dtype: Any = jnp.float32) -> "PixelDiTConfig":
        img = cfg.get("image", {})
        core = MMDiTConfig.from_dict(cfg["model"]["core"], dtype=dtype)
        diff = cfg["diffusion"]["image"]
        return cls(
            image_size=int(img.get("size", 32)),
            channels=int(img.get("channels", 3)),
            patch=int(cfg["tokenizer"]["image"]["patch"]),
            width=core.d_model,
            core=core,
            steps=int(diff["steps"]),
            schedule=str(diff.get("schedule", "cosine")),
            min_beta=float(diff.get("min_beta", 1e-4)),
            max_beta=float(diff.get("max_beta", 2e-2)),
            dtype=dtype,
        )

    @property
    def n_tokens(self) -> int:
        return (self.image_size // self.patch) ** 2

    @property
    def token_dim(self) -> int:
        return self.channels * self.patch * self.patch


class PixelDiT(nn.Module):
    """Unconditional epsilon-predictor over pixel patches."""

    cfg: PixelDiTConfig

    def setup(self):
        c = self.cfg
        self.adapter = LinearAdapter(c.width, dtype=c.dtype)
        self.pos = PositionalEmbedding1D(c.width, max_len=c.n_tokens,
                                         mode="learned", dtype=c.dtype)
        self.core = MMDiT(c.core)
        self.head = NoisePredictionHead(output_dim=c.token_dim,
                                        hidden_dim=c.width, num_layers=2,
                                        dropout=0.0, dtype=c.dtype)

    def __call__(self, x_t: jnp.ndarray, t: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x_t: [B, C, H, W] noisy image, t: [B] -> eps_hat [B, C, H, W]."""
        c = self.cfg
        tok = patch_image(x_t, c.patch)
        h = self.adapter(tok) + self.pos(tok.shape[1])
        h = h + S.timestep_embedding(t, c.width).astype(h.dtype)[:, None, :]
        h = self.core(h, deterministic=deterministic)
        eps_tok = self.head(h, deterministic=deterministic)
        return unpatch_image(eps_tok, c.channels, c.image_size, c.image_size,
                             c.patch)


# ---------------------------------------------------------------------------
# training + sampling
# ---------------------------------------------------------------------------


def make_pixel_train_step(model: PixelDiT, tx):
    """Returns train_step(params, opt_state, rng, batch) -> (params,
    opt_state, rng, loss).  batch: images [B, C, H, W] in [-1, 1]."""
    c = model.cfg
    betas = S.make_beta_schedule(c.steps, c.schedule, c.min_beta, c.max_beta)
    _, abar = S.alphas_cumprod_from_betas(betas)
    abar = jnp.asarray(abar)

    def step(params, opt_state, rng, batch):
        rng, kt, kn = jax.random.split(rng, 3)
        B = batch.shape[0]
        t = jax.random.randint(kt, (B,), 0, c.steps)
        x_t, eps = S.q_sample(batch, t, abar, key=kn)

        def loss_fn(p):
            eps_hat = model.apply({"params": p}, x_t, t, False)
            return jnp.mean(
                jnp.square(eps_hat.astype(jnp.float32) - eps.astype(jnp.float32))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return step


def make_ancestral_sampler(model: PixelDiT):
    """Full 1000-step ancestral DDPM sampler as ONE lax.scan on device
    (BASELINE config #1's '1000-step ancestral sampler')."""
    c = model.cfg
    betas = jnp.asarray(
        S.make_beta_schedule(c.steps, c.schedule, c.min_beta, c.max_beta)
    )
    _, abar = S.alphas_cumprod_from_betas(np.asarray(betas))
    abar = jnp.asarray(abar)

    def sample(params, rng, batch_size: int):
        rng, k0 = jax.random.split(rng)
        shape = (batch_size, c.channels, c.image_size, c.image_size)
        x_T = jax.random.normal(k0, shape, jnp.float32)
        ts = jnp.arange(c.steps - 1, -1, -1, dtype=jnp.int32)  # T-1 .. 0

        def body(carry, t):
            x, key = carry
            key, kz = jax.random.split(key)
            tb = jnp.full((batch_size,), t, jnp.int32)
            eps_hat = model.apply({"params": params}, x, tb, True)
            z = jax.random.normal(kz, shape, jnp.float32)
            x = S.ddpm_step(x, tb, eps_hat, betas, abar, z,
                            clip_x0=(-1.0, 1.0))
            return (x, key), None

        (x0, _), _ = jax.lax.scan(body, (x_T, rng), ts)
        return jnp.clip(x0, -1.0, 1.0)

    return sample
