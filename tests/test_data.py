"""Dataset, collate, and loader tests (the reference shipped empty dataset
stubs and no dataset tests — SURVEY §2 'Empty stubs' row, §4)."""

import json

import numpy as np
import pytest
from PIL import Image

from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset
from multimodal_diffusion_tpu.datasets.collate import collate_batch
from multimodal_diffusion_tpu.datasets.loader import DataLoader
from multimodal_diffusion_tpu.media.audio_io import read_wav, write_wav


@pytest.fixture()
def tiny_corpus(tmp_path):
    """Two clips: 6 frames of 16x16 @ fps=8 + 1 s of 8 kHz audio each."""
    clips = []
    rng = np.random.default_rng(0)
    for i in range(2):
        fdir = tmp_path / f"clip_{i}"
        fdir.mkdir()
        for t in range(6):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(fdir / f"frame_{t:06d}.jpg")
        wav_path = tmp_path / f"clip_{i}.wav"
        write_wav(wav_path, rng.uniform(-0.5, 0.5, 8000).astype(np.float32), 8000)
        clips.append({
            "video_frames_dir": str(fdir),
            "audio_wav_path": str(wav_path),
            "fps": 8, "sr": 8000, "clip_seconds": 1.0,
        })
    manifest = tmp_path / "clips.json"
    manifest.write_text(json.dumps({"clips": clips}))
    return manifest


def test_dataset_loads_and_pads(tiny_corpus):
    ds = AVClipsDataset(tiny_corpus, clip_seconds=1.0, fps=8, sr=8000,
                        size_hw=(16, 16))
    assert len(ds) == 2
    item = ds[0]
    # 6 frames padded to T=8 by repeating the last frame
    assert item["video"].shape == (3, 8, 16, 16)
    np.testing.assert_array_equal(item["video"][:, 6], item["video"][:, 7])
    assert item["audio"].shape == (1, 8000)
    assert item["video"].min() >= 0.0 and item["video"].max() <= 1.0


def test_dataset_resamples_audio(tiny_corpus, tmp_path):
    # write a 16 kHz wav; dataset at 8 kHz must resample to L=8000
    write_wav(tmp_path / "hi.wav",
              np.sin(np.linspace(0, 100, 16000)).astype(np.float32), 16000)
    ds = AVClipsDataset(tiny_corpus, clip_seconds=1.0, fps=8, sr=8000,
                        size_hw=(16, 16))
    ds.items[0]["audio_wav_path"] = str(tmp_path / "hi.wav")
    assert ds[0]["audio"].shape == (1, 8000)


def test_collate_pads_and_masks():
    items = [
        {"video": np.ones((3, 5, 8, 8), np.float32),
         "audio": np.ones((1, 900), np.float32)},
        {"video": None, "audio": np.ones((1, 1100), np.float32)},
    ]
    out = collate_batch(items, T_target=8, L_target=1000, pick_target="video")
    assert out["video"].shape == (2, 3, 8, 8, 8)
    assert out["audio"].shape == (2, 1, 1000)
    assert out["has_video"].tolist() == [True, False]
    assert out["has_audio"].tolist() == [True, True]
    # zero-fill for the missing video
    assert np.all(out["video"][1] == 0)
    # repeat-last-frame pad for the short video
    np.testing.assert_array_equal(out["video"][0][:, 4], out["video"][0][:, 7])
    # crop for long audio / zero-pad for short
    assert np.all(out["audio"][0, 0, 900:] == 0)
    assert out["target"] == {"video"}


def test_collate_target_fallback():
    items = [{"video": None, "audio": np.zeros((1, 10), np.float32)}]
    out = collate_batch(items, T_target=2, L_target=10, pick_target="video")
    assert out["target"] == {"audio"}  # requested modality absent -> fallback
    assert out["video"] is None


def test_loader_epochs_and_sharding(tiny_corpus):
    ds = AVClipsDataset(tiny_corpus, clip_seconds=1.0, fps=8, sr=8000,
                        size_hw=(16, 16))
    dl = DataLoader(ds, batch_size=1,
                    collate_fn=lambda it: collate_batch(it, 8, 8000),
                    shuffle=True, num_workers=2, seed=1)
    batches = list(dl.epoch(0))
    assert len(batches) == 2
    assert batches[0]["video"].shape == (1, 3, 8, 16, 16)
    # two shards split the epoch disjointly
    dl0 = DataLoader(ds, 1, lambda it: collate_batch(it, 8, 8000),
                     shard_id=0, num_shards=2, drop_last=False)
    dl1 = DataLoader(ds, 1, lambda it: collate_batch(it, 8, 8000),
                     shard_id=1, num_shards=2, drop_last=False)
    assert len(list(dl0.epoch(0))) + len(list(dl1.epoch(0))) == 2


def test_wav_roundtrip(tmp_path):
    y = np.sin(np.linspace(0, 50, 4000)).astype(np.float32) * 0.7
    write_wav(tmp_path / "x.wav", y, 8000)
    y2, sr = read_wav(tmp_path / "x.wav")
    assert sr == 8000
    np.testing.assert_allclose(y2, y, atol=1.5e-4)  # 16-bit quantization
