"""GRID .mpg audio extraction: MPEG-1 PS demux + MP2 decode via the
ffmpeg libraries bundled with the opencv wheel (VERDICT r1 #6: round 1
trained on synthesized tones because the image 'lacks an MP2 demuxer')."""

from pathlib import Path

import numpy as np
import pytest

from multimodal_diffusion_tpu.media.mpeg_audio import (
    available, demux_ps_audio, parse_mp2_header, read_mpeg_audio,
    split_mp2_frames,
)

GRID = Path("/root/reference/data/video/GRID/raw/s1/s1")
CLIP = GRID / "sgiv3a.mpg"

needs_data = pytest.mark.skipif(not CLIP.exists(), reason="GRID data absent")
needs_ffmpeg = pytest.mark.skipif(not available(),
                                  reason="bundled ffmpeg libs absent")


def test_parse_mp2_header_rejects_garbage():
    assert parse_mp2_header(b"\x00\x00\x00\x00") is None
    assert parse_mp2_header(b"\xff\xfb\x90\x04") is None  # layer III
    hdr = parse_mp2_header(bytes([0xFF, 0xFD, 0xB0, 0x04]))
    assert hdr is not None
    frame_bytes, sr, ch, kbps = hdr
    assert (sr, ch, kbps) == (44100, 2, 224)
    assert frame_bytes == 144 * 224000 // 44100


@needs_data
def test_demux_and_frame_split():
    es = demux_ps_audio(CLIP)
    assert len(es) > 50_000
    frames, sr, ch = split_mp2_frames(es)
    assert sr == 44100 and ch == 2
    # 3 s clip at 1152 samples/frame @44.1k -> ~115 frames
    assert 100 <= len(frames) <= 130


@needs_data
@needs_ffmpeg
def test_decode_real_grid_speech():
    y, sr = read_mpeg_audio(CLIP, sr=16000)
    assert sr == 16000
    dur = y.shape[0] / sr
    assert 2.5 < dur < 3.5
    assert np.isfinite(y).all() and np.abs(y).max() <= 1.0
    # real speech, not silence/noise: voiced middle >> quiet lead-in, and
    # telephone-band energy dominates
    rms = lambda a: float(np.sqrt(np.mean(a ** 2)))
    assert rms(y[sr:2 * sr]) > 3 * rms(y[: sr // 3])
    S = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f = np.fft.rfftfreq(len(y), 1 / sr)
    assert S[f < 3400].sum() / S.sum() > 0.7

    # deterministic decode
    y2, _ = read_mpeg_audio(CLIP, sr=16000)
    np.testing.assert_array_equal(y, y2)
