"""Shared tiny config for CPU-fast end-to-end tests (1 s clips, 32x32 video,
d_model=64 core) — same key tree as configs/mvp.yaml."""

import copy


TINY_CFG = {
    "experiment": "tiny_test",
    "seed": 0,
    "device": "cpu",
    "mixed_precision": "fp32",
    "paths": {"out_root": "/tmp/tiny", "ckpt_dir": "/tmp/tiny/ckpt",
              "log_dir": "/tmp/tiny/logs", "samples_dir": "/tmp/tiny/samples"},
    "data": {"clip_seconds": 1.0, "batch_size": 2, "num_workers": 0,
             "pin_memory": False, "prefetch_factor": 2, "grad_accum_steps": 1},
    "video": {
        "fps": 8,
        "size": [32, 32],
        "latent": {"channels": 8, "t_down": 4, "s_down": 8},
    },
    "audio": {
        "sr": 8000,
        "representation": "codec",
        "codec": {"hop_samples": 160, "hidden": 16, "smooth_kernel": 7},
        "latent": {"channels": 8, "frames_per_clip": 50},
    },
    "tokenizer": {
        "width": 64,
        "video": {"tube": {"t": 2, "h": 1, "w": 1}},
        "audio": {"chunk": {"length": 4, "stride": 4}},
    },
    "embeddings": {
        "use_modality_embed": True,
        "posenc": {"video": "learned_3d", "audio": "learned_1d"},
        "timestep_embed": "sinusoidal",
        "timestep_dim": 64,
    },
    "model": {
        "core": {"d_model": 64, "n_layers": 2, "n_heads": 4, "mlp_ratio": 2.0,
                 "dropout": 0.0, "attn_dropout": 0.0, "norm": "rmsnorm",
                 "rope": False, "token_dropout": 0.0},
        "heads": {
            "video": {"out_dim": 16, "hidden_dim": 64, "num_layers": 2,
                      "dropout": 0.0, "activation": "gelu"},
            "audio": {"out_dim": 32, "hidden_dim": 64, "num_layers": 2,
                      "dropout": 0.0, "activation": "gelu"},
        },
    },
    "diffusion": {
        "video": {"steps": 100, "sampler_steps": 4, "schedule": "cosine",
                  "min_beta": 1e-4, "max_beta": 0.02},
        "audio": {"steps": 100, "sampler_steps": 4, "schedule": "cosine",
                  "min_beta": 1e-4, "max_beta": 0.02},
    },
    "training": {
        "any2any_targets": {"video": 0.5, "audio": 0.5},
        "cfg_drop_prob": 0.1,
        "align_loss_weight": 0.0,
        "optimizer": {"name": "adamw", "lr": 3e-4, "weight_decay": 0.05,
                      "betas": [0.9, 0.95], "eps": 1e-8},
        "scheduler": {"name": "cosine", "warmup_steps": 2},
        "max_steps": 100,
        "val_every": 50,
        "log_every": 2,
        "ckpt_every": 50,
        "grad_clip_norm": 1.0,
        "ema": {"use_ema": True, "decay": 0.99},
    },
    "sampling": {"ddim_eta": 0.0,
                 "guidance_scale": {"video": 3.0, "audio": 3.0},
                 "prompt_modality": "video"},
    "streaming": {"enabled": True, "window_seconds": 1.0, "hop_seconds": 0.5,
                  "crossfade_seconds": 0.125},
    "parallel": {"data": 1, "model": 1, "remat_core": False},
}


def tiny_cfg():
    return copy.deepcopy(TINY_CFG)
