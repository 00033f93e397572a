"""API-surface parity items: ModalitySchedule wrapper, tokenizer classes,
single-modality datasets, config validator, env templating."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests._tiny import tiny_cfg


def test_modality_schedule_wrapper():
    from multimodal_diffusion_tpu.models.schedules import (
        ModalitySchedule, build_schedules_from_config,
    )

    sch = build_schedules_from_config(tiny_cfg())
    assert set(sch) == {"video", "audio"}
    sv = sch["video"]
    assert sv.steps == 100 and sv.betas.shape == (100,)
    z0 = jnp.ones((2, 3, 4))
    zt, eps = sv.q_sample(z0, jnp.array([10, 50]), key=jax.random.PRNGKey(0))
    assert zt.shape == z0.shape
    back = sv.ddim_step(zt, jnp.array([10, 50]), jnp.array([-1, -1]), eps)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z0), rtol=1e-4,
                               atol=1e-4)
    assert sv.make_sampling_schedule(4).tolist()[0] == 99


def test_tokenizer_classes():
    from multimodal_diffusion_tpu.models.tokenizers import (
        AudioTokenizer, VideoTokenizer,
    )

    vt = VideoTokenizer(lat_ch=8, t=2, h=4, w=4)
    assert vt.token_dim == 256
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 12, 16, 16))
    tok = vt.encode(z)
    assert tok.shape == (1, 96, 256)
    np.testing.assert_array_equal(np.asarray(vt.decode(tok, 12, 16, 16)),
                                  np.asarray(z))

    at = AudioTokenizer(lat_ch=8, length=4, stride=4)
    assert at.token_dim == 32 and at.num_tokens(150) == 37
    za = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 150))
    tok_a = at.encode(za)
    assert tok_a.shape == (1, 37, 32)
    z_back = at.decode(tok_a, 150)
    np.testing.assert_allclose(np.asarray(z_back[..., :148]),
                               np.asarray(za[..., :148]), rtol=0, atol=0)


def test_single_modality_datasets(tmp_path):
    import numpy as np
    from PIL import Image

    from multimodal_diffusion_tpu.datasets.audio_dataset import AudioDataset
    from multimodal_diffusion_tpu.datasets.collate import collate_batch
    from multimodal_diffusion_tpu.datasets.frames_dataset import FramesDataset
    from multimodal_diffusion_tpu.media.audio_io import write_wav

    fdir = tmp_path / "clip_0"
    fdir.mkdir()
    for t in range(3):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            fdir / f"frame_{t:06d}.jpg")
    ds_v = FramesDataset(tmp_path, clip_seconds=0.5, fps=8, size_hw=(8, 8))
    item = ds_v[0]
    assert item["video"].shape == (3, 4, 8, 8) and item["audio"] is None

    write_wav(tmp_path / "a.wav", np.zeros(4000, np.float32), 8000)
    ds_a = AudioDataset(tmp_path, clip_seconds=1.0, sr=8000)
    item_a = ds_a[0]
    assert item_a["audio"].shape == (1, 8000) and item_a["video"] is None

    # mixed batch through the shared collate: masks line up
    out = collate_batch([item, item_a], T_target=4, L_target=8000,
                        pick_target="video", default_hw=(8, 8))
    assert out["has_video"].tolist() == [True, False]
    assert out["has_audio"].tolist() == [False, True]


def test_config_validator_pass_and_fail(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from configs.validate_config import validate

    cfg = tiny_cfg()
    assert validate(cfg) == []
    bad = tiny_cfg()
    bad["tokenizer"]["width"] = 999  # != d_model
    errs = validate(bad)
    assert any("d_model" in e for e in errs)
    bad2 = tiny_cfg()
    del bad2["diffusion"]
    assert any("diffusion" in e for e in validate(bad2))


def test_env_templating(tmp_path, monkeypatch):
    from multimodal_diffusion_tpu.utils.io import load_config

    p = tmp_path / "c.yaml"
    p.write_text("paths:\n  ckpt: '${MY_CKPT_DIR:-/default/ckpt}/latest'\n"
                 "name: '${MY_NAME}'\n")
    cfg = load_config(p)
    assert cfg["paths"]["ckpt"] == "/default/ckpt/latest"
    assert cfg["name"] == "${MY_NAME}"  # unset without default -> literal
    monkeypatch.setenv("MY_CKPT_DIR", "/real")
    monkeypatch.setenv("MY_NAME", "x")
    cfg = load_config(p)
    assert cfg["paths"]["ckpt"] == "/real/latest" and cfg["name"] == "x"


def test_repo_configs_validate():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "configs/validate_config.py", "configs/mvp.yaml",
         "configs/a2v.yaml", "configs/v2a.yaml", "configs/mvp_cpu.yaml"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
