"""End-to-end CLI smoke: train_joint -> checkpoint -> sample_clip (both
in-process via main(argv)).  Mirrors the manual verification flow so CLI
regressions surface in CI."""

import json

import numpy as np
import pytest
import yaml
from PIL import Image

from multimodal_diffusion_tpu.media.audio_io import read_wav, write_wav
from tests._tiny import tiny_cfg


# the three tests form one e2e chain (train -> sample v2a -> sample
# a2v); each is >15 s and they share a trained checkpoint, so the
# whole module is slow-tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    rng = np.random.default_rng(0)
    clips = []
    for i in range(4):
        fdir = root / f"clip_{i}"
        fdir.mkdir()
        for t in range(8):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(fdir / f"frame_{t:06d}.jpg")
        write_wav(root / f"clip_{i}.wav",
                  rng.uniform(-0.5, 0.5, 8000).astype(np.float32), 8000)
        clips.append({
            "video_frames_dir": str(fdir),
            "audio_wav_path": str(root / f"clip_{i}.wav"),
            "fps": 8, "sr": 8000, "clip_seconds": 1.0,
        })
    (root / "clips.json").write_text(json.dumps({"clips": clips}))

    cfg = tiny_cfg()
    cfg["paths"] = {
        "out_root": str(root / "run"),
        "ckpt_dir": str(root / "run/ckpt"),
        "log_dir": str(root / "run/logs"),
        "samples_dir": str(root / "run/samples"),
        "ckpt_path": str(root / "run/ckpt/latest"),
    }
    cfg["data"].update({
        "train_split_glob": str(root / "clips.json"),
        "val_split_glob": str(root / "clips.json"),
        "num_workers": 2,
    })
    cfg["training"].update({"max_steps": 2, "log_every": 1, "ckpt_every": 50,
                            "val_every": 2})
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path


def test_train_joint_cli(workspace):
    from multimodal_diffusion_tpu.train.train_joint import main

    root, cfg_path = workspace
    main(["--config", str(cfg_path), "--max-steps", "2"])
    from multimodal_diffusion_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(root / "run/ckpt")
    assert mgr.latest_step() == 2
    mgr.close()
    # metrics jsonl written
    lines = (root / "run/logs/metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 1 and "loss" in lines[0]


def test_sample_clip_cli_v2a(workspace):
    from multimodal_diffusion_tpu.infer.sample_clip import main

    root, cfg_path = workspace
    out = root / "out.wav"
    main(["--config", str(cfg_path), "--frames", str(root / "clip_0"),
          "--out-audio", str(out)])
    wav, sr = read_wav(out)
    assert sr == 8000 and wav.shape == (8000,) and np.isfinite(wav).all()


def test_sample_clip_cli_a2v_with_ema(workspace):
    import yaml as _yaml

    from multimodal_diffusion_tpu.infer.sample_clip import main

    root, cfg_path = workspace
    cfg = _yaml.safe_load(cfg_path.read_text())
    cfg["sampling"]["prompt_modality"] = "audio"
    a2v_path = root / "cfg_a2v.yaml"
    a2v_path.write_text(_yaml.safe_dump(cfg))
    out_dir = root / "frames_out"
    main(["--config", str(a2v_path), "--audio", str(root / "clip_0.wav"),
          "--out-frames", str(out_dir), "--ema"])
    frames = sorted(out_dir.glob("frame_*.jpg"))
    assert len(frames) == 8  # fps 8 x 1 s
