"""AudioCodec — learned waveform <-> latent-frame codec (Flax).

Capability parity with the reference `avdiff/models/encoders/audio_codec.py`:
  encode: two k=9 Conv1d+GELU -> average-pool at hop (or exact
          `frames_per_clip` hop solving, audio_codec.py:144-157) -> 1x1 to
          lat_ch.   [B,1,L] -> [B,Ca,Fa]
  decode: 1x1 -> nearest-upsample x hop -> three k=smooth_kernel convs
          (GELU between) -> tanh.   [B,Ca,Fa] -> [B,1,Fa*hop]
  config derivation: hop_samples from `latent.frame_hop_ms * sr` when present,
  else `codec.hop_samples` (audio_codec.py:47-73); `check_consistency` timing
  diagnostic (218-234).

Channels-last [B, L, C] internally for TPU conv efficiency; channels-first
at the API boundary like the reference.
"""

from __future__ import annotations

import dataclasses
import math
import warnings
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# kaiming-uniform with a=0.2 (reference init, audio_codec.py:128-132)
_kaiming = nn.initializers.variance_scaling(
    2.0 / (1.0 + 0.2**2), "fan_in", "uniform"
)


@dataclasses.dataclass(frozen=True)
class AudioCodecConfig:
    in_ch: int = 1
    lat_ch: int = 8
    sr: int = 16000
    hop_samples: int = 320
    hidden: int = 64
    smooth_kernel: int = 7
    frames_per_clip: Optional[int] = None
    dtype: Any = jnp.float32

    @classmethod
    def from_dict(cls, d: Dict, **overrides) -> "AudioCodecConfig":
        lat = d.get("latent", {})
        codec = d.get("codec", {})
        sr = int(d.get("sr", 16000))
        if "frame_hop_ms" in lat:
            hop_samples = max(1, int(round(sr * float(lat["frame_hop_ms"]) / 1000.0)))
        else:
            hop_samples = int(codec.get("hop_samples", 320))
        kw = dict(
            in_ch=int(d.get("in_ch", 1)),
            lat_ch=int(lat.get("channels", 8)),
            sr=sr,
            hop_samples=hop_samples,
            hidden=int(codec.get("hidden", 64)),
            smooth_kernel=int(codec.get("smooth_kernel", 7)),
            frames_per_clip=int(lat.get("frames_per_clip", 0)) or None,
        )
        kw.update(overrides)
        return cls(**kw)


def exact_pool_params(L: int, Fa: int) -> Tuple[int, int]:
    """Integer hop with Fa*hop >= L and minimal right-pad
    (reference audio_codec.py:144-157)."""
    assert Fa > 0
    hop = max(1, int(round(L / Fa)))
    total = Fa * hop
    if total < L:
        hop += 1
        total = Fa * hop
    return hop, total


class AudioCodec(nn.Module):
    cfg: AudioCodecConfig

    def setup(self):
        c = self.cfg
        k = max(3, int(c.smooth_kernel))
        self._k = k
        conv = lambda feat, ksize, name: nn.Conv(  # noqa: E731
            feat, (ksize,), padding="SAME", dtype=c.dtype,
            param_dtype=jnp.float32, kernel_init=_kaiming, name=name,
        )
        self.pre0 = conv(c.hidden, 9, "pre0")
        self.pre1 = conv(c.hidden, 9, "pre1")
        self.to_lat = conv(c.lat_ch, 1, "to_lat")
        self.from_lat = conv(c.hidden, 1, "from_lat")
        self.smooth0 = conv(c.hidden, k, "smooth0")
        self.smooth1 = conv(c.hidden, k, "smooth1")
        self.smooth2 = conv(c.in_ch, k, "smooth2")

    @property
    def hop(self) -> int:
        return int(self.cfg.hop_samples)

    def _avgpool_frames(self, x: jnp.ndarray, target_Fa: Optional[int]) -> jnp.ndarray:
        """[B, L, H] -> [B, Fa, H]; L is static so hop math is compile-time."""
        B, L, H = x.shape
        if target_Fa is None:
            hop = self.hop
            Fa = math.ceil(L / hop)
            total = Fa * hop
        else:
            Fa = int(target_Fa)
            hop, total = exact_pool_params(L, Fa)
        if total > L:
            x = jnp.pad(x, ((0, 0), (0, total - L), (0, 0)))
        elif total < L:
            x = x[:, :total]
        # equal-width average pooling == reshape + mean (count_include_pad is
        # irrelevant: every window is full after the exact pad above; the pad
        # region contributes zeros exactly like torch's zero-padded input)
        return x.reshape(B, Fa, hop, H).mean(axis=2)

    # -------------------- API --------------------

    def encode(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav: [B, 1, L] mono in [-1,1] -> z: [B, Ca, Fa]."""
        if wav.ndim != 3 or wav.shape[1] != self.cfg.in_ch:
            raise ValueError(f"AudioCodec.encode expects [B,{self.cfg.in_ch},L], got {wav.shape}")
        h = wav.transpose(0, 2, 1).astype(self.cfg.dtype)  # [B, L, C]
        h = nn.gelu(self.pre0(h), approximate=False)
        h = nn.gelu(self.pre1(h), approximate=False)
        h = self._avgpool_frames(h, self.cfg.frames_per_clip)
        z = self.to_lat(h)  # [B, Fa, Ca]
        return z.transpose(0, 2, 1)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: [B, Ca, Fa] -> wav_hat: [B, 1, Fa*hop] in [-1,1]."""
        if z.ndim != 3:
            raise ValueError("AudioCodec.decode expects [B,Ca,Fa]")
        h = z.transpose(0, 2, 1).astype(self.cfg.dtype)  # [B, Fa, Ca]
        h = self.from_lat(h)
        h = jnp.repeat(h, self.hop, axis=1)  # nearest upsample by hop
        h = nn.gelu(self.smooth0(h), approximate=False)
        h = nn.gelu(self.smooth1(h), approximate=False)
        y = nn.tanh(self.smooth2(h))
        return y.transpose(0, 2, 1)

    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full autoencode (init/reconstruction): returns (wav_hat, z)."""
        z = self.encode(wav)
        return self.decode(z), z

    def check_consistency(self, clip_seconds: Optional[float] = None) -> None:
        c = self.cfg
        if c.frames_per_clip is None or clip_seconds is None:
            return
        dur_est = c.frames_per_clip * self.hop / float(c.sr)
        if abs(dur_est - float(clip_seconds)) > 0.02:
            warnings.warn(
                f"[AudioCodec] frames_per_clip x hop_s = {dur_est:.3f}s does not "
                f"match clip_seconds={float(clip_seconds):.3f}s; adjust "
                f"'latent.frame_hop_ms' or 'latent.frames_per_clip'."
            )
