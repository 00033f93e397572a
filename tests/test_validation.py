"""Validation loop (the reference parsed val_every but wired no val path)."""

import numpy as np

from tests._tiny import tiny_cfg


def test_run_validation():
    from multimodal_diffusion_tpu.train.trainer import (
        create_trainer, run_validation,
    )

    cfg = tiny_cfg()
    bundle = create_trainer(cfg)
    B = bundle.latent_shapes["video"][0]

    def batches():
        rng = np.random.default_rng(0)  # fresh stream per call
        for _ in range(3):
            yield {
                "video": rng.uniform(0, 1, bundle.latent_shapes["video"]).astype(np.float32),
                "audio": rng.uniform(-1, 1, bundle.latent_shapes["audio"]).astype(np.float32),
                "has_video": np.ones(B, bool),
                "has_audio": np.ones(B, bool),
            }

    metrics = run_validation(bundle, batches(), n_batches=3)
    assert set(metrics) == {"val_loss_video", "val_loss_audio", "val_loss"}
    assert all(np.isfinite(v) for v in metrics.values())
    # deterministic: same seed -> same values
    metrics2 = run_validation(bundle, batches(), n_batches=3)
    assert metrics2["val_loss"] == metrics["val_loss"]
