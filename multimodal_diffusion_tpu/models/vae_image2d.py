"""ImageVAE — 2-D convolutional autoencoder for latent image diffusion
(BASELINE configs #2/#3: 256x256 / 512x512 latent diffusion).

Same design language as the video VAE (models/vae_video3d.py) minus the time
axis, but with strided-conv downsampling stages (not a single avg-pool):
each stage halves H/W, so `down` must be a power of two.  Channels-last
(NHWC) internally for MXU-friendly convs; [B, C, H, W] at the API boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ImageVAEConfig:
    in_ch: int = 3
    lat_ch: int = 4
    down: int = 8  # spatial downsample factor (power of 2)
    base: int = 64
    max_ch: int = 256
    blocks_per_stage: int = 1
    variational: bool = False
    out_activation: str = "tanh"  # images in [-1, 1]
    dtype: Any = jnp.float32

    @classmethod
    def from_dict(cls, d: Dict, **overrides) -> "ImageVAEConfig":
        lat = d.get("latent", {})
        kw = dict(
            in_ch=int(d.get("in_ch", 3)),
            lat_ch=int(lat.get("channels", 4)),
            down=int(lat.get("s_down", lat.get("down", 8))),
            base=int(d.get("encoder", {}).get("base", 64)),
            max_ch=int(d.get("encoder", {}).get("max_ch", 256)),
            blocks_per_stage=int(d.get("encoder", {}).get("blocks", 1)),
            variational=bool(d.get("variational", False)),
            out_activation=str(d.get("out_activation", "tanh")),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def n_stages(self) -> int:
        down, n = self.down, 0
        while down > 1:
            if down % 2:
                raise ValueError("down must be a power of 2")
            down //= 2
            n += 1
        return n

    def ch(self, stage: int) -> int:
        return min(self.base * (2**stage), self.max_ch)


class ResBlock2D(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NHWC
        h = nn.GroupNorm(num_groups=min(8, x.shape[-1]), dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype,
                         param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        return x + h


def upsample2x_nearest(h: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsampling as broadcast+reshape — a pure layout change XLA
    fuses into the next conv.  (jax.image.resize(method='nearest') lowers to
    gathers, which measured ~100x slower for the 512^2 decode on TPU.)"""
    B, H, W, C = h.shape
    h = jnp.broadcast_to(h[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return h.reshape(B, 2 * H, 2 * W, C)


class ImageVAE(nn.Module):
    cfg: ImageVAEConfig

    def setup(self):
        c = self.cfg
        conv = lambda feat, k, name, stride=1: nn.Conv(  # noqa: E731
            feat, (k, k), strides=(stride, stride), padding="SAME",
            dtype=c.dtype, param_dtype=jnp.float32, name=name,
        )
        n = c.n_stages
        self.enc_in = conv(c.ch(0), 3, "enc_in")
        self.enc_blocks = [
            [ResBlock2D(c.ch(s), c.dtype, name=f"enc_{s}_{b}")
             for b in range(c.blocks_per_stage)]
            for s in range(n)
        ]
        self.enc_down = [conv(c.ch(s + 1), 3, f"enc_down_{s}", stride=2)
                         for s in range(n)]
        self.enc_mid = ResBlock2D(c.ch(n), c.dtype, name="enc_mid")
        if c.variational:
            self.to_mu = conv(c.lat_ch, 1, "to_mu")
            self.to_logv = conv(c.lat_ch, 1, "to_logv")
        else:
            self.to_lat = conv(c.lat_ch, 1, "to_lat")

        self.dec_in = conv(c.ch(n), 3, "dec_in")
        self.dec_mid = ResBlock2D(c.ch(n), c.dtype, name="dec_mid")
        self.dec_up = [conv(c.ch(s), 3, f"dec_up_{s}") for s in range(n)]
        self.dec_blocks = [
            [ResBlock2D(c.ch(s), c.dtype, name=f"dec_{s}_{b}")
             for b in range(c.blocks_per_stage)]
            for s in range(n)
        ]
        self.dec_norm = nn.GroupNorm(num_groups=min(8, c.ch(0)),
                                     dtype=c.dtype, param_dtype=jnp.float32,
                                     name="dec_norm")
        self.dec_out = conv(c.in_ch, 3, "dec_out")

    # ------------------------------ API ------------------------------

    def encode_with_kld(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """x: [B, C, H, W] -> (z: [B, lat_ch, H/down, W/down], kld | None)."""
        c = self.cfg
        h = x.transpose(0, 2, 3, 1).astype(c.dtype)  # NHWC
        h = self.enc_in(h)
        for s in range(c.n_stages):
            for blk in self.enc_blocks[s]:
                h = blk(h)
            h = self.enc_down[s](h)
        h = self.enc_mid(h)
        kld = None
        if c.variational:
            mu = self.to_mu(h)
            logv = self.to_logv(h)
            if rng is not None:
                z = mu + jax.random.normal(rng, mu.shape, mu.dtype) * jnp.exp(
                    0.5 * logv
                )
            else:
                z = mu
            kld = 0.5 * jnp.mean(
                -1.0 - logv.astype(jnp.float32)
                + jnp.square(mu.astype(jnp.float32))
                + jnp.exp(logv.astype(jnp.float32))
            )
        else:
            z = self.to_lat(h)
        return z.transpose(0, 3, 1, 2), kld

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        return self.encode_with_kld(x, rng)[0]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: [B, lat_ch, H', W'] -> x_hat [B, C, H'*down, W'*down]."""
        c = self.cfg
        h = z.transpose(0, 2, 3, 1).astype(c.dtype)
        h = self.dec_in(h)
        h = self.dec_mid(h)
        for s in reversed(range(c.n_stages)):
            h = upsample2x_nearest(h)
            h = self.dec_up[s](h)
            for blk in self.dec_blocks[s]:
                h = blk(h)
        h = nn.silu(self.dec_norm(h))
        x = self.dec_out(h)
        x = nn.tanh(x) if c.out_activation == "tanh" else nn.sigmoid(x)
        return x.transpose(0, 3, 1, 2)

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        """Autoencode (init/reconstruction): returns (x_hat, z, kld)."""
        z, kld = self.encode_with_kld(x, rng)
        return self.decode(z), z, kld
