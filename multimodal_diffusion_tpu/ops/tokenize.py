"""Latent <-> token transforms, XLA-friendly (no Python loops on the hot path).

Capability parity with the reference `avdiff/utils/ops.py` (chunk_1d:17-45,
overlap_add_1d:48-93, tube_patch_video:100-119, tube_unpatch_video:122-144,
pad_to_multiple:151-161), re-designed for TPU:

  * tube patch/unpatch are pure reshape+transpose — XLA treats these as layout
    changes and fuses them into neighbouring ops.
  * 1-D chunking is a static gather (take along a precomputed index grid).
  * overlap-add is a single vectorized scatter-add over all windows at once
    (the reference loops in Python per window, and the reference sampler loops
    per batch x channel — sample_clip.py:191-215).  When stride == length the
    fold is a pure reshape and the scatter disappears.

Token layout conventions (identical to the reference):
  video: [B, C, T, H, W] -> [B, N, C*t*h*w], tokens raster-ordered t-major
         then h then w; within a token the feature order is (C, t, h, w).
  audio: [B, C, F] -> [B, N, C*l], feature order (C, l).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# video tube patching
# ---------------------------------------------------------------------------


def tube_patch_video(z: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    """[B, C, T, H, W] -> [B, N, C*t*h*w], N = (T/t)(H/h)(W/w)."""
    B, C, T, H, W = z.shape
    if T % t or H % h or W % w:
        raise ValueError(f"tube sizes ({t},{h},{w}) must divide latent dims ({T},{H},{W})")
    z = z.reshape(B, C, T // t, t, H // h, h, W // w, w)
    z = z.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # [B, T', H', W', C, t, h, w]
    return z.reshape(B, (T // t) * (H // h) * (W // w), C * t * h * w)


def tube_unpatch_video(
    tokens: jnp.ndarray, C: int, T: int, H: int, W: int, t: int, h: int, w: int
) -> jnp.ndarray:
    """Inverse of tube_patch_video: [B, N, C*t*h*w] -> [B, C, T, H, W]."""
    B, N, D = tokens.shape
    if D != C * t * h * w:
        raise ValueError(f"token width {D} != C*t*h*w = {C * t * h * w}")
    Tt, Hh, Ww = T // t, H // h, W // w
    if N != Tt * Hh * Ww:
        raise ValueError(f"token count {N} != {Tt * Hh * Ww}")
    z = tokens.reshape(B, Tt, Hh, Ww, C, t, h, w)
    z = z.transpose(0, 4, 1, 5, 2, 6, 3, 7)  # [B, C, T', t, H', h, W', w]
    return z.reshape(B, C, T, H, W)


# ---------------------------------------------------------------------------
# 1-D chunking (audio)
# ---------------------------------------------------------------------------


def num_chunks(L: int, length: int, stride: int) -> int:
    """Window count for chunk_1d: floor((L - length)/stride) + 1 (>=1)."""
    if length <= 0 or stride <= 0 or L < length:
        return 1
    return (L - length) // stride + 1


def chunk_1d(x: jnp.ndarray, length: int, stride: int, axis: int = -1) -> jnp.ndarray:
    """Strided windows along `axis`: [..., L, ...] -> [..., N, length] with the
    window pair appended at the end (window dim at -2, like the reference).

    Short-input fallback matches reference ops.py:37-39: a single (possibly
    shorter) window.  Shapes are static, so the gather grid is a compile-time
    constant.
    """
    x = jnp.moveaxis(x, axis, -1)
    L = x.shape[-1]
    if length <= 0 or stride <= 0 or L < length:
        out = x[..., : max(0, min(L, length))][..., None, :]
    else:
        N = num_chunks(L, length, stride)
        idx = np.arange(N)[:, None] * stride + np.arange(length)[None, :]  # [N, len]
        out = x[..., idx]  # static gather -> [..., N, len]
    if axis not in (-1, x.ndim - 1):
        out = jnp.moveaxis(out, -2, axis)
    return out


def overlap_add_1d(
    windows: jnp.ndarray,
    stride: int,
    length: Optional[int] = None,
    apply_hann: bool = False,
) -> jnp.ndarray:
    """Overlap-add reconstruction: [..., N, W] -> [..., L], L = (N-1)*stride + W.

    Vectorized: one scatter-add over a flattened [N*W] index grid (replacing
    the reference's per-window Python loop, ops.py:86-89).  The normalization
    track is computed once for the window shape, not per batch element.
    stride == W (non-overlapping) short-circuits to a reshape.
    """
    *prefix, N, W = windows.shape
    if length is not None and length != W:
        windows = windows[..., :length]
        W = length
    L_out = (N - 1) * stride + W

    if apply_hann:
        win = _hann(W, windows.dtype)
    else:
        win = jnp.ones((W,), dtype=windows.dtype)

    if stride == W and not apply_hann:
        return windows.reshape(*prefix, L_out)

    idx = (np.arange(N)[:, None] * stride + np.arange(W)[None, :]).reshape(-1)
    vals = (windows * win).reshape(*prefix, N * W)
    y = jnp.zeros((*prefix, L_out), dtype=windows.dtype).at[..., idx].add(vals)
    norm = jnp.zeros((L_out,), dtype=windows.dtype).at[idx].add(jnp.tile(win, N))
    return y / jnp.clip(norm, 1e-8, None)


def _hann(W: int, dtype) -> jnp.ndarray:
    """Periodic Hann window (same as torch.hann_window(W), reference ops.py:82)."""
    n = np.arange(W, dtype=np.float32)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * n / W), dtype=dtype)


def pad_to_multiple(
    x: jnp.ndarray, multiple: int, axis: int = -1, value: float = 0.0
) -> Tuple[jnp.ndarray, int]:
    """Right-pad `axis` to a multiple of `multiple`; returns (padded, pad_amt)."""
    size = x.shape[axis]
    pad_amt = (multiple - size % multiple) % multiple
    if pad_amt == 0:
        return x, 0
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, pad_amt)
    return jnp.pad(x, pads, constant_values=value), pad_amt


# ---------------------------------------------------------------------------
# audio latent <-> token helpers (fused layout transforms)
# ---------------------------------------------------------------------------


def audio_tokens_from_latent(z_a: jnp.ndarray, length: int, stride: int) -> jnp.ndarray:
    """[B, C, F] -> [B, N, C*length]; feature order (C, l) like the reference
    trainer (_tokenize_audio, trainer.py:249-252)."""
    windows = chunk_1d(z_a, length=length, stride=stride, axis=-1)  # [B, C, N, l]
    B, C, N, l = windows.shape
    return windows.transpose(0, 2, 1, 3).reshape(B, N, C * l)


def audio_latent_from_tokens(
    tokens: jnp.ndarray, C: int, length: int, F: int, stride: int
) -> jnp.ndarray:
    """Inverse fold: [B, N, C*length] -> [B, C, F] via vectorized overlap-add,
    then crop/pad the time axis to exactly F (reference sample_clip.py:191-215,
    minus its per-(batch, channel) Python loops)."""
    B, N, D = tokens.shape
    if D != C * length:
        raise ValueError(f"token width {D} != C*length = {C * length}")
    windows = tokens.reshape(B, N, C, length).transpose(0, 2, 1, 3)  # [B, C, N, l]
    z = overlap_add_1d(windows, stride=stride, length=length)  # [B, C, L]
    L = z.shape[-1]
    if L > F:
        z = z[..., :F]
    elif L < F:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, F - L)))
    return z
