"""VideoVAE — 3-D (time/space) video autoencoder (Flax).

Capability parity with the reference `avdiff/models/encoders/vae_video3d.py`:
  encode: conv blocks (Conv3d k=3 -> GELU -> GroupNorm) -> AvgPool3d
          (t_down, s_down, s_down) -> 1x1 conv to lat_ch
          [B,3,T,H,W] -> [B,Cv,T/t_down,H/s_down,W/s_down]
  decode: 1x1 -> trilinear upsample -> conv blocks -> 1x1 -> sigmoid/tanh
  optional variational reparameterization + KL (vae_video3d.py:176-186),
  center-crop of non-divisible inputs with a one-time warning (137-160).

TPU-first notes: tensors are channels-last (NDHWC) internally so XLA maps the
3-D convs straight onto the MXU; the public API keeps the reference's
channels-first [B, C, T, H, W] contract at the boundary.  KL is returned
functionally (no module state) via `encode_with_kld`.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

_warned_divisibility = False


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    in_ch: int = 3
    lat_ch: int = 8
    t_down: int = 4
    s_down: int = 8
    enc_base: int = 64
    enc_blocks: int = 2
    dec_base: int = 64
    dec_blocks: int = 2
    variational: bool = False
    out_activation: str = "sigmoid"  # "sigmoid" | "tanh"
    # "conv" = the reference architecture (full-res conv blocks + avg-pool,
    # vae_video3d.py:79-160); "patch" = MXU-first tubelet embedding: one
    # Dense over non-overlapping (t_down, s_down, s_down) patches + conv
    # mixing at LATENT resolution.  The conv encoder spends ~97% of its
    # FLOPs convolving 64 channels at full 48x128x128 before any
    # downsampling (measured 58 ms of a 143 ms AV train step, PERFORMANCE
    # "AV train-step decomposition"); the patch encoder does the same
    # downsampling as a single tile-aligned matmul.
    arch: str = "conv"  # "conv" | "patch"
    hidden: int = 0  # patch-arch channel width (0 -> 2 * enc_base)
    dtype: Any = jnp.float32

    @classmethod
    def from_dict(cls, d: Dict, **overrides) -> "VideoVAEConfig":
        """Config tree matches the reference YAML (`video:` block)."""
        lat = d.get("latent", {})
        enc = d.get("encoder", {})
        dec = d.get("decoder", {})
        kw = dict(
            in_ch=int(d.get("in_ch", 3)),
            lat_ch=int(lat.get("channels", 8)),
            t_down=int(lat.get("t_down", 4)),
            s_down=int(lat.get("s_down", 8)),
            enc_base=int(enc.get("base", 64)),
            enc_blocks=int(enc.get("blocks", 2)),
            dec_base=int(dec.get("base", 64)),
            dec_blocks=int(dec.get("blocks", 2)),
            variational=bool(d.get("variational", False)),
            out_activation=str(d.get("out_activation", "sigmoid")),
            arch=str(d.get("arch", enc.get("arch", "conv"))),
            hidden=int(enc.get("hidden", 0)),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def patch_hidden(self) -> int:
        return self.hidden if self.hidden > 0 else 2 * self.enc_base

    @property
    def patch_dim(self) -> int:
        return self.t_down * self.s_down * self.s_down * self.in_ch


class ConvBlock3D(nn.Module):
    """Conv3d(k=3, same) -> GELU -> GroupNorm(min(8, C)) — note the norm sits
    AFTER the activation, matching the reference block (vae_video3d.py:79-84)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NDHWC
        x = nn.Conv(
            self.features, (3, 3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.gelu(x, approximate=False)  # exact GELU (torch parity)
        return nn.GroupNorm(
            num_groups=min(8, self.features), epsilon=1e-5,  # torch GN eps
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


def _conv1x1(features: int, dtype: Dtype, name: str) -> nn.Conv:
    return nn.Conv(features, (1, 1, 1), dtype=dtype, param_dtype=jnp.float32,
                   name=name)


class VideoVAE(nn.Module):
    cfg: VideoVAEConfig

    def setup(self):
        c = self.cfg
        if c.arch not in ("conv", "patch"):
            raise ValueError(f"VideoVAE arch must be 'conv'|'patch', got {c.arch!r}")
        if c.arch == "patch":
            hid = c.patch_hidden
            self.patch_embed = nn.Dense(hid, dtype=c.dtype,
                                        param_dtype=jnp.float32,
                                        name="patch_embed")
            self.patch_norm = nn.LayerNorm(dtype=c.dtype,
                                           param_dtype=jnp.float32,
                                           name="patch_norm")
            self.enc_net = [
                ConvBlock3D(hid, c.dtype, name=f"enc_{i}")
                for i in range(c.enc_blocks)
            ]
            dec_width = hid
        else:
            self.enc_net = [
                ConvBlock3D(c.enc_base, c.dtype, name=f"enc_{i}")
                for i in range(c.enc_blocks)
            ]
            dec_width = c.dec_base
        if c.variational:
            self.to_mu = _conv1x1(c.lat_ch, c.dtype, "to_mu")
            self.to_logv = _conv1x1(c.lat_ch, c.dtype, "to_logv")
        else:
            self.to_lat = _conv1x1(c.lat_ch, c.dtype, "to_lat")
        self.from_lat = _conv1x1(dec_width, c.dtype, "from_lat")
        self.dec_net = [
            ConvBlock3D(dec_width, c.dtype, name=f"dec_{i}")
            for i in range(c.dec_blocks)
        ]
        if c.arch == "patch":
            self.unpatch_proj = nn.Dense(c.patch_dim, dtype=c.dtype,
                                         param_dtype=jnp.float32,
                                         name="unpatch_proj")
        else:
            self.to_img = _conv1x1(c.in_ch, c.dtype, "to_img")

    # -------------------- helpers --------------------

    def _patchify(self, h: jnp.ndarray) -> jnp.ndarray:
        """NDHWC [B,T,H,W,C] -> [B, T', H', W', t_down*s_down*s_down*C]
        (non-overlapping tubelets; pure layout change for XLA)."""
        c = self.cfg
        B, T, H, W, C = h.shape
        td, sd = c.t_down, c.s_down
        h = h.reshape(B, T // td, td, H // sd, sd, W // sd, sd, C)
        h = h.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        return h.reshape(B, T // td, H // sd, W // sd, td * sd * sd * C)

    def _unpatchify(self, h: jnp.ndarray) -> jnp.ndarray:
        """[B, T', H', W', td*sd*sd*C] -> NDHWC [B, T, H, W, C]."""
        c = self.cfg
        B, Tp, Hp, Wp, _ = h.shape
        td, sd, C = c.t_down, c.s_down, c.in_ch
        h = h.reshape(B, Tp, Hp, Wp, td, sd, sd, C)
        h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return h.reshape(B, Tp * td, Hp * sd, Wp * sd, C)

    def _center_crop(self, x: jnp.ndarray) -> jnp.ndarray:
        """Center-crop [B,C,T,H,W] so dims divide the downsample factors
        (reference vae_video3d.py:137-160; warns once per process)."""
        global _warned_divisibility
        c = self.cfg
        B, C, T, H, W = x.shape
        T2 = (T // c.t_down) * c.t_down
        H2 = (H // c.s_down) * c.s_down
        W2 = (W // c.s_down) * c.s_down
        if (T2, H2, W2) == (T, H, W):
            return x
        if not _warned_divisibility:
            warnings.warn(
                f"[VideoVAE] input (T={T},H={H},W={W}) not divisible by "
                f"(t_down={c.t_down}, s_down={c.s_down}); center-cropping to "
                f"(T={T2},H={H2},W={W2})."
            )
            _warned_divisibility = True
        t0, h0, w0 = (T - T2) // 2, (H - H2) // 2, (W - W2) // 2
        return x[:, :, t0 : t0 + T2, h0 : h0 + H2, w0 : w0 + W2]

    # -------------------- API --------------------

    def encode_with_kld(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """x: [B, 3, T, H, W] -> (z: [B, Cv, T', H', W'], kld or None).

        If variational and `rng` is given, samples z = mu + sigma*eps
        (training); with rng=None returns the mean (eval), matching the
        reference's self.training switch (vae_video3d.py:176-186).
        """
        c = self.cfg
        x = self._center_crop(x)
        h = x.transpose(0, 2, 3, 4, 1).astype(c.dtype)  # -> NDHWC
        if c.arch == "patch":
            h = self.patch_norm(self.patch_embed(self._patchify(h)))
            h = nn.gelu(h, approximate=False)
            for blk in self.enc_net:
                h = blk(h)
        else:
            for blk in self.enc_net:
                h = blk(h)
            h = nn.avg_pool(
                h,
                window_shape=(c.t_down, c.s_down, c.s_down),
                strides=(c.t_down, c.s_down, c.s_down),
            )
        kld = None
        if c.variational:
            mu = self.to_mu(h)
            logv = self.to_logv(h)
            if rng is not None:
                eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
                z = mu + eps * jnp.exp(0.5 * logv)
            else:
                z = mu
            kld = 0.5 * jnp.mean(
                -1.0 - logv.astype(jnp.float32)
                + jnp.square(mu.astype(jnp.float32))
                + jnp.exp(logv.astype(jnp.float32))
            )
        else:
            z = self.to_lat(h)
        return z.transpose(0, 4, 1, 2, 3), kld  # -> NCDHW

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self.encode_with_kld(x, rng)[0]

    def decode(
        self, z: jnp.ndarray, out_size: Optional[Tuple[int, int, int]] = None
    ) -> jnp.ndarray:
        """z: [B, Cv, T', H', W'] -> x_hat: [B, 3, T, H, W] in [0,1] (sigmoid)
        or [-1,1] (tanh).  Trilinear upsample with half-pixel centers ==
        torch F.interpolate(align_corners=False) (vae_video3d.py:209)."""
        c = self.cfg
        B, Cv, Tp, Hp, Wp = z.shape
        h = z.transpose(0, 2, 3, 4, 1).astype(c.dtype)  # NDHWC
        h = self.from_lat(h)
        if out_size is None:
            T, H, W = Tp * c.t_down, Hp * c.s_down, Wp * c.s_down
        else:
            T, H, W = out_size
        if c.arch == "patch":
            for blk in self.dec_net:
                h = blk(h)
            x = self._unpatchify(self.unpatch_proj(h))
            if x.shape[1:4] != (T, H, W):  # rare variable-size path
                x = jax.image.resize(x, (B, T, H, W, x.shape[-1]),
                                     method="trilinear")
        else:
            h = jax.image.resize(h, (B, T, H, W, h.shape[-1]),
                                 method="trilinear")
            for blk in self.dec_net:
                h = blk(h)
            x = self.to_img(h)
        x = nn.sigmoid(x) if c.out_activation == "sigmoid" else nn.tanh(x)
        return x.transpose(0, 4, 1, 2, 3)

    def __call__(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Full autoencode (used for init + reconstruction training):
        returns (x_hat, z, kld)."""
        z, kld = self.encode_with_kld(x, rng)
        return self.decode(z), z, kld
