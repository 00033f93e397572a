"""Projection + embedding toolkit (Flax).

Capability parity with the reference `avdiff/models/adapters.py`:
LinearAdapter (28-38), ModalityEmbedding (41-52), PositionalEmbedding1D
(65-85), PositionalEmbedding3D (88-127), TimestepEmbedder (137-158).

Unlike the reference — whose trainer/sampler bypass this module and inline
their own adapters with *incompatible* timestep conventions (SURVEY §2.12.2)
— this toolkit is the ONLY embedding path in the rebuild: models/diffusion.py
composes these modules for both training and sampling, with one convention
(ADD a width-d sinusoidal timestep embedding, the trainer's choice).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.schedule import timestep_embedding

Dtype = Any


class LinearAdapter(nn.Module):
    """Per-token linear projection to width d (xavier init, zero bias)."""

    d_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.d_out,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj",
        )(x)


class ModalityEmbedding(nn.Module):
    """Learned per-modality embedding added to every token of that modality."""

    d: int
    modalities: Sequence[str] = ("video", "audio")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, modality: str) -> jnp.ndarray:
        table = self.param(
            "table",
            nn.initializers.normal(stddev=0.02),
            (len(self.modalities), self.d),
            jnp.float32,
        )
        idx = list(self.modalities).index(modality)
        return x + table[idx].astype(self.dtype)[None, None, :]


def _sinusoid_table(n: int, d: int) -> np.ndarray:
    """Interleaved sin/cos positional table [n, d] (transformer-standard,
    reference adapters.py:57-63)."""
    pe = np.zeros((n, d), dtype=np.float32)
    pos = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * (-math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe


class PositionalEmbedding1D(nn.Module):
    """1-D positions for audio tokens; mode 'learned' or 'sin'."""

    d: int
    max_len: int = 4096
    mode: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, N: int) -> jnp.ndarray:
        """Returns [1, N, d] (broadcasts over batch)."""
        if self.mode == "learned":
            table = self.param(
                "table",
                nn.initializers.normal(stddev=0.02),
                (self.max_len, self.d),
                jnp.float32,
            )
            pe = table[:N]
        else:
            pe = jnp.asarray(_sinusoid_table(N, self.d))
        return pe.astype(self.dtype)[None]


class PositionalEmbedding3D(nn.Module):
    """3-D factorized positions for video tokens at grid (T', H', W'):
    per-axis learned tables summed, raster order t-major then h, w."""

    d: int
    max_t: int = 256
    max_h: int = 256
    max_w: int = 256
    mode: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, Tt: int, Hh: int, Ww: int) -> jnp.ndarray:
        """Returns [1, Tt*Hh*Ww, d]."""
        N = Tt * Hh * Ww
        if self.mode == "learned":
            init = nn.initializers.normal(stddev=0.02)
            tt = self.param("t_table", init, (self.max_t, self.d), jnp.float32)
            hh = self.param("h_table", init, (self.max_h, self.d), jnp.float32)
            ww = self.param("w_table", init, (self.max_w, self.d), jnp.float32)
            pe = (
                tt[:Tt, None, None, :]
                + hh[None, :Hh, None, :]
                + ww[None, None, :Ww, :]
            ).reshape(N, self.d)
        else:
            pe = jnp.asarray(_sinusoid_table(N, self.d))
        return pe.astype(self.dtype)[None]


class TimestepEmbedder(nn.Module):
    """t [B] int -> [B, dim]; sinusoidal base, optional MLP refinement."""

    dim: int = 256
    mode: str = "sin"  # "sin" | "mlp"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        base = timestep_embedding(t, self.dim)  # fp32, cos||sin order
        if self.mode == "mlp":
            h = nn.Dense(self.dim * 2, dtype=self.dtype, param_dtype=jnp.float32)(
                base.astype(self.dtype)
            )
            h = nn.silu(h)
            return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return base.astype(self.dtype)
