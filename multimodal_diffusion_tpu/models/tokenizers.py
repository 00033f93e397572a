"""Tokenizer convenience classes.

Parity with reference `avdiff/models/tokenizers.py:33-117` (VideoTokenizer /
AudioTokenizer) — class wrappers over the functional ops with `token_dim`
accessors.  These delegate to the SAME vectorized ops the hot paths use
(ops/tokenize), so unlike the reference there is no slower duplicate
implementation (the reference's AudioTokenizer.decode looped in Python per
batch x channel, SURVEY §2.12.10).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops import tokenize as tk


@dataclasses.dataclass(frozen=True)
class VideoTokenizer:
    lat_ch: int
    t: int
    h: int
    w: int

    @property
    def token_dim(self) -> int:
        return self.lat_ch * self.t * self.h * self.w

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, C, T, H, W] -> [B, N, token_dim]."""
        return tk.tube_patch_video(z, self.t, self.h, self.w)

    def decode(self, tokens: jnp.ndarray, T: int, H: int, W: int) -> jnp.ndarray:
        """[B, N, token_dim] -> [B, C, T, H, W]."""
        return tk.tube_unpatch_video(tokens, self.lat_ch, T, H, W,
                                     self.t, self.h, self.w)


@dataclasses.dataclass(frozen=True)
class AudioTokenizer:
    lat_ch: int
    length: int
    stride: int

    @property
    def token_dim(self) -> int:
        return self.lat_ch * self.length

    def num_tokens(self, F: int) -> int:
        return tk.num_chunks(F, self.length, self.stride)

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, C, F] -> [B, N, token_dim]."""
        return tk.audio_tokens_from_latent(z, self.length, self.stride)

    def decode(self, tokens: jnp.ndarray, F: int) -> jnp.ndarray:
        """[B, N, token_dim] -> [B, C, F] (vectorized overlap-add)."""
        return tk.audio_latent_from_tokens(tokens, self.lat_ch, self.length,
                                           F, self.stride)
