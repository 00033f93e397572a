"""On-device preprocessing path: uint8 [T,H,W,3] host transport with
normalize/transpose inside the jitted train step (BASELINE north star)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tests._tiny import tiny_cfg


def test_collate_uint8_layout():
    from multimodal_diffusion_tpu.datasets.collate import collate_batch

    items = [
        {"video": np.ones((5, 8, 8, 3), np.uint8) * 7,
         "audio": np.ones((1, 900), np.float32)},
        {"video": None, "audio": np.ones((1, 1100), np.float32)},
    ]
    out = collate_batch(items, T_target=8, L_target=1000, pick_target="video")
    assert out["video"].shape == (2, 8, 8, 8, 3)
    assert out["video"].dtype == np.uint8
    # repeat-last-frame pad on time axis 0 (per-item)
    np.testing.assert_array_equal(out["video"][0][4], out["video"][0][7])
    assert np.all(out["video"][1] == 0)


def test_dataset_uint8_mode(tmp_path):
    from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset
    from multimodal_diffusion_tpu.media.audio_io import write_wav

    fdir = tmp_path / "clip_0"
    fdir.mkdir()
    rng = np.random.default_rng(0)
    for t in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        ).save(fdir / f"frame_{t:06d}.jpg")
    write_wav(tmp_path / "a.wav", np.zeros(8000, np.float32), 8000)
    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"clips": [{
        "video_frames_dir": str(fdir), "audio_wav_path": str(tmp_path / "a.wav"),
    }]}))
    ds = AVClipsDataset(manifest, clip_seconds=0.5, fps=8, sr=8000,
                        size_hw=(16, 16), device_preprocess=True)
    item = ds[0]
    assert item["video"].dtype == np.uint8
    assert item["video"].shape == (4, 16, 16, 3)
    # f32 mode returns the normalized transpose of the same pixels
    ds_f = AVClipsDataset(manifest, clip_seconds=0.5, fps=8, sr=8000,
                          size_hw=(16, 16), device_preprocess=False)
    v_f = ds_f[0]["video"]
    v_u = item["video"].astype(np.float32).transpose(3, 0, 1, 2) / 255.0
    np.testing.assert_allclose(v_f, v_u, atol=1e-6)


@pytest.mark.slow
def test_train_step_accepts_uint8_video():
    """The same training math runs from uint8 input; loss matches the f32
    path bit-for-bit (same RNG stream)."""
    from multimodal_diffusion_tpu.train.trainer import create_trainer

    cfg = tiny_cfg()
    bundle = create_trainer(cfg)
    B = bundle.latent_shapes["video"][0]
    rng = np.random.default_rng(0)
    vid_u8 = rng.integers(0, 255, (B, 8, 32, 32, 3), dtype=np.uint8)
    aud = rng.uniform(-1, 1, bundle.latent_shapes["audio"]).astype(np.float32)
    masks = {"has_video": np.ones(B, bool), "has_audio": np.ones(B, bool)}
    tiv = jnp.asarray(1.0, jnp.float32)

    batch_u8 = {"video": jnp.asarray(vid_u8), "audio": jnp.asarray(aud), **{
        k: jnp.asarray(v) for k, v in masks.items()}}
    state_u8, m_u8 = bundle.train_step(bundle.state, batch_u8, tiv)

    vid_f32 = vid_u8.astype(np.float32).transpose(0, 4, 1, 2, 3) / 255.0
    bundle2 = create_trainer(tiny_cfg())  # fresh state, same seed
    batch_f = {"video": jnp.asarray(vid_f32), "audio": jnp.asarray(aud), **{
        k: jnp.asarray(v) for k, v in masks.items()}}
    state_f, m_f = bundle2.train_step(bundle2.state, batch_f, tiv)

    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
