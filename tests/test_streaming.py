"""Streaming windowing + crossfade helpers (pure numpy, reference
stream_infer.py:40-143 semantics)."""

import numpy as np

from multimodal_diffusion_tpu.infer.stream_infer import (
    crossfade_audio, crossfade_video, split_audio_into_windows,
    split_frames_into_windows,
)


def test_split_audio_windows():
    y = np.arange(2.5 * 100, dtype=np.float32)  # 2.5 s at sr=100
    chunks, win, hop = split_audio_into_windows(y, sr=100, win_s=1.0, hop_s=0.5)
    assert win == 100 and hop == 50
    assert chunks.shape == (4, 100)
    np.testing.assert_array_equal(chunks[0], y[:100])
    np.testing.assert_array_equal(chunks[1], y[50:150])
    # last window zero-padded to full length
    assert chunks[-1][-1] == 0.0 or len(y) % hop == 0
    # short input -> single padded window
    short, _, _ = split_audio_into_windows(y[:30], sr=100, win_s=1.0, hop_s=0.5)
    assert short.shape == (1, 100) and short[0, 30:].sum() == 0.0


def test_split_frames_windows_pads_last_frame():
    frames = np.arange(20)[:, None, None, None].repeat(2, 1).repeat(2, 2).repeat(3, 3).astype(np.uint8)
    chunks, win, hop = split_frames_into_windows(frames, fps=8, win_s=1.0,
                                                 hop_s=0.5)
    assert win == 8 and hop == 4
    assert chunks.shape[1] == 8
    # final chunk padded by repeating the last frame
    assert (chunks[-1][-1] == frames[-1]).all()


def test_crossfade_audio_constant_signal():
    """Crossfading constant windows must reconstruct the constant."""
    sr, hop, win = 100, 50, 100
    chunks = np.ones((3, win), np.float32) * 0.5
    y = crossfade_audio(chunks, sr=sr, hop=hop, win=win, fade_s=0.2)
    assert y.shape == (2 * hop + win,)
    # interior is exact; the global first/last samples get ~zero fade weight
    # (reference stream_infer.py:102-103 boundary behavior, kept for parity)
    np.testing.assert_allclose(y[1:-1], 0.5, atol=1e-6)
    # zero fade -> rectangular OLA, same result for constants
    y0 = crossfade_audio(chunks, sr=sr, hop=hop, win=win, fade_s=0.0)
    np.testing.assert_allclose(y0, 0.5, atol=1e-6)


def test_crossfade_video_blends():
    a = np.zeros((4, 2, 2, 3), np.uint8)
    b = np.full((4, 2, 2, 3), 200, np.uint8)
    out = crossfade_video(np.stack([a, b]), hop=2, win=4, fade_f=2)
    assert out.shape == (6, 2, 2, 3)
    # non-overlap interior keeps source values; the global last frame gets
    # zero ramp weight (reference stream_infer.py:130-133 boundary behavior)
    assert (out[0] == 0).all()
    assert (out[-2] == 200).all()
    # overlap region blends between them
    mid = out[2:4].mean()
    assert 0.0 < mid < 200.0
