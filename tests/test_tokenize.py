"""Round-trip + contract tests for tokenization ops (mirrors the reference's
tests/test_shapes.py coverage, plus layout-equivalence checks vs a naive
per-element implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_diffusion_tpu.ops import tokenize as T


def test_tube_patch_roundtrip():
    rng = np.random.default_rng(24)
    z = jnp.asarray(rng.standard_normal((2, 8, 12, 16, 16)).astype(np.float32))
    tok = T.tube_patch_video(z, t=2, h=4, w=4)
    assert tok.shape == (2, (12 // 2) * (16 // 4) * (16 // 4), 8 * 2 * 4 * 4)
    back = T.tube_unpatch_video(tok, C=8, T=12, H=16, W=16, t=2, h=4, w=4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), rtol=0, atol=0)


def test_tube_patch_layout_matches_naive():
    """Token feature order must be (C, t, h, w); tokens raster t-major."""
    C, Tt, H, W = 2, 4, 4, 4
    t, h, w = 2, 2, 2
    z = np.arange(C * Tt * H * W, dtype=np.float32).reshape(1, C, Tt, H, W)
    tok = np.asarray(T.tube_patch_video(jnp.asarray(z), t, h, w))
    # naive gather for token (ti, hi, wi)
    n = 0
    for ti in range(Tt // t):
        for hi in range(H // h):
            for wi in range(W // w):
                ref = z[0, :, ti * t:(ti + 1) * t, hi * h:(hi + 1) * h,
                        wi * w:(wi + 1) * w].reshape(-1)
                np.testing.assert_array_equal(tok[0, n], ref)
                n += 1


def test_chunk_1d_counts_and_values():
    x = jnp.arange(20, dtype=jnp.float32)[None, None, :]  # [1,1,20]
    win = T.chunk_1d(x, length=6, stride=4)
    assert win.shape == (1, 1, (20 - 6) // 4 + 1, 6)
    np.testing.assert_array_equal(np.asarray(win[0, 0, 0]), np.arange(6))
    np.testing.assert_array_equal(np.asarray(win[0, 0, 1]), np.arange(4, 10))
    # short-input fallback: single truncated window
    short = T.chunk_1d(jnp.arange(3.0), length=6, stride=4)
    assert short.shape == (1, 3)


def test_overlap_add_roundtrip_nonoverlapping():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 1, 12)
    win = T.chunk_1d(x, length=4, stride=4)
    y = T.overlap_add_1d(win, stride=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)


def test_overlap_add_overlapping_normalized():
    """Overlapping constant windows must reconstruct the constant exactly."""
    N, Wn, s = 5, 8, 4
    win = jnp.ones((1, N, Wn))
    y = T.overlap_add_1d(win, stride=s)
    assert y.shape == (1, (N - 1) * s + Wn)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


def test_overlap_add_matches_loop_reference():
    """Scatter-add OLA == naive loop (with averaging by overlap count)."""
    rng = np.random.default_rng(7)
    win = rng.standard_normal((2, 6, 8)).astype(np.float32)
    s = 3
    L = 5 * s + 8
    y_loop = np.zeros((2, L), np.float32)
    norm = np.zeros((L,), np.float32)
    for i in range(6):
        y_loop[:, i * s:i * s + 8] += win[:, i]
        norm[i * s:i * s + 8] += 1.0
    y_loop /= np.maximum(norm, 1e-8)
    y = T.overlap_add_1d(jnp.asarray(win), stride=s)
    np.testing.assert_allclose(np.asarray(y), y_loop, rtol=1e-5, atol=1e-6)


def test_overlap_add_hann():
    rng = np.random.default_rng(3)
    win = rng.standard_normal((1, 4, 8)).astype(np.float32)
    y = T.overlap_add_1d(jnp.asarray(win), stride=4, apply_hann=True)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
    L = 3 * 4 + 8
    num = np.zeros((1, L), np.float32)
    den = np.zeros((L,), np.float32)
    for i in range(4):
        num[:, i * 4:i * 4 + 8] += win[:, i] * hann
        den[i * 4:i * 4 + 8] += hann
    expect = num / np.maximum(den, 1e-8)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-5)


def test_audio_token_roundtrip():
    rng = np.random.default_rng(77)
    z = jnp.asarray(rng.standard_normal((2, 8, 150)).astype(np.float32))
    tok = T.audio_tokens_from_latent(z, length=4, stride=4)
    # N = floor((150-4)/4)+1 = 37 tokens of width 32 (SURVEY §2.A)
    assert tok.shape == (2, 37, 32)
    z_back = T.audio_latent_from_tokens(tok, C=8, length=4, F=150, stride=4)
    # non-overlapping fold covers 148 of 150 frames; rest zero-padded
    np.testing.assert_allclose(np.asarray(z_back[..., :148]),
                               np.asarray(z[..., :148]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(z_back[..., 148:]), 0.0)


def test_pad_to_multiple():
    x = jnp.ones((2, 5))
    y, amt = T.pad_to_multiple(x, 4, axis=-1)
    assert y.shape == (2, 8) and amt == 3
    assert float(y[0, 5]) == 0.0
    y2, amt2 = T.pad_to_multiple(x, 5, axis=-1)
    assert amt2 == 0 and y2.shape == (2, 5)


def test_num_chunks():
    assert T.num_chunks(150, 4, 4) == 37
    assert T.num_chunks(20, 6, 4) == 4
    assert T.num_chunks(3, 6, 4) == 1
