"""Native C++ loader: build, correctness vs the Python path, dataset
integration, throughput sanity."""

import time

import numpy as np
import pytest
from PIL import Image

from multimodal_diffusion_tpu.datasets import native_loader as nl
from multimodal_diffusion_tpu.media.audio_io import read_wav, write_wav


pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native avloader did not build")


@pytest.fixture()
def frame_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for t in range(8):
        y, x = np.mgrid[0:48, 0:48]
        img = np.stack([(x * 5 + t * 3) % 256, (y * 5) % 256,
                        ((x + y) * 3) % 256], -1).astype(np.uint8)
        p = tmp_path / f"frame_{t:06d}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return tmp_path, paths


def test_decode_clip_matches_pil(frame_dir):
    _, paths = frame_dir
    clip = nl.decode_clip(paths, 24, 24)
    assert clip.shape == (3, 8, 24, 24) and clip.dtype == np.float32
    ims = [np.asarray(Image.open(p).convert("RGB").resize((24, 24),
                                                          Image.BILINEAR),
                      dtype=np.uint8) for p in paths]
    ref = np.transpose(np.stack(ims).astype(np.float32) / 255.0, (3, 0, 1, 2))
    # PIL BILINEAR antialiases on downscale; plain bilinear differs slightly
    assert np.abs(clip - ref).mean() < 0.02


def test_decode_clip_same_size_exact(frame_dir):
    """No resize -> identical pixels to PIL (same libjpeg underneath)."""
    _, paths = frame_dir
    clip = nl.decode_clip(paths, 48, 48)
    ims = [np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8)
           for p in paths]
    ref = np.transpose(np.stack(ims).astype(np.float32) / 255.0, (3, 0, 1, 2))
    np.testing.assert_allclose(clip, ref, atol=1e-6)


def test_decode_missing_file_raises(frame_dir):
    _, paths = frame_dir
    with pytest.raises(RuntimeError, match="frame 1"):
        nl.decode_clip([paths[0], "/nonexistent.jpg", paths[2]], 24, 24)


def test_wav_roundtrip_native(tmp_path):
    y = (np.sin(np.linspace(0, 80, 12000)) * 0.6).astype(np.float32)
    write_wav(tmp_path / "x.wav", y, 16000)
    got, sr = nl.read_wav_mono(tmp_path / "x.wav")
    assert sr == 16000 and got.shape == (12000,)
    np.testing.assert_allclose(got, y, atol=1.5e-4)
    ref, _ = read_wav(tmp_path / "x.wav")
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_dataset_uses_native(frame_dir, tmp_path):
    import json

    from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset

    d, _ = frame_dir
    write_wav(tmp_path / "a.wav", np.zeros(8000, np.float32), 8000)
    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"clips": [{
        "video_frames_dir": str(d), "audio_wav_path": str(tmp_path / "a.wav"),
    }]}))
    ds = AVClipsDataset(manifest, clip_seconds=1.0, fps=8, sr=8000,
                        size_hw=(24, 24))
    assert ds._native is not None
    item = ds[0]
    assert item["video"].shape == (3, 8, 24, 24)
    assert item["audio"].shape == (1, 8000)
    # python fallback produces (approximately) the same tensors
    ds_py = AVClipsDataset(manifest, clip_seconds=1.0, fps=8, sr=8000,
                           size_hw=(24, 24), use_native=False)
    assert ds_py._native is None
    # downscale filters differ (PIL antialiases; native is plain bilinear) —
    # the sawtooth fixture aliases hard, so compare in the mean
    assert np.abs(item["video"] - ds_py[0]["video"]).mean() < 0.05
    np.testing.assert_allclose(item["audio"], ds_py[0]["audio"], atol=1e-4)


def test_native_faster_than_pil(frame_dir):
    _, paths = frame_dir
    paths = paths * 6  # 48 frames
    t0 = time.perf_counter()
    nl.decode_clip(paths, 32, 32)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in paths:
        np.asarray(Image.open(p).convert("RGB").resize((32, 32),
                                                       Image.BILINEAR))
    t_pil = time.perf_counter() - t0
    assert t_native < t_pil, (t_native, t_pil)
