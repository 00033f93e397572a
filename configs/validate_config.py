#!/usr/bin/env python3
"""Config lint CLI (parity with reference `configs/validate_config.py:60-114`):
per-file schema of required dotted keys + value rules, with ${VAR:-default}
expansion.  Unlike the reference (which rejected the device value its own
mvp.yaml used — SURVEY §2.12.4), rules here match the shipped configs, and
the same loader/expansion code path as train/infer is used.

Usage: python configs/validate_config.py [mvp.yaml a2v.yaml ...]
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Callable, Dict, List, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_diffusion_tpu.utils.io import load_config  # noqa: E402

Rule = Tuple[str, Callable[[Any], bool], str]

BASE_REQUIRED = [
    "experiment",
    "data.clip_seconds",
    "video.fps", "video.size", "video.latent.channels",
    "video.latent.t_down", "video.latent.s_down",
    "audio.sr", "audio.latent.channels", "audio.latent.frames_per_clip",
    "tokenizer.width", "tokenizer.video.tube.t", "tokenizer.audio.chunk.length",
    "model.core.d_model", "model.core.n_layers", "model.core.n_heads",
    "model.heads.video.out_dim", "model.heads.audio.out_dim",
    "diffusion.video.steps", "diffusion.audio.steps",
    "training.optimizer.lr", "training.max_steps",
    "sampling.guidance_scale",
]

RULES: List[Rule] = [
    ("device", lambda v: v in {"tpu", "cpu", "cuda", "mps"},
     "device must be tpu|cpu|cuda|mps"),
    ("mixed_precision", lambda v: v in {"fp32", "bf16", "fp16", "bfloat16"},
     "mixed_precision must be fp32|bf16|fp16"),
    ("tokenizer.width", lambda v: int(v) > 0, "tokenizer.width must be > 0"),
    ("model.core.d_model", lambda v: int(v) > 0, "d_model must be > 0"),
    ("diffusion.video.steps", lambda v: int(v) > 1, "steps must be > 1"),
    ("diffusion.video.schedule",
     lambda v: v in {"cosine", "linear", "sigmoid"},
     "schedule must be cosine|linear|sigmoid"),
    ("training.cfg_drop_prob", lambda v: 0.0 <= float(v) <= 1.0,
     "cfg_drop_prob in [0,1]"),
    ("training.clean_cond_prob", lambda v: 0.0 <= float(v) <= 1.0,
     "clean_cond_prob in [0,1]"),
    ("sampling.prompt_modality", lambda v: v in {"video", "audio"},
     "prompt_modality must be video|audio"),
    ("parallel.model", lambda v: int(v) >= 1, "parallel.model must be >= 1"),
    ("diffusion.video.param", lambda v: v in {"eps", "x0", "v"},
     "diffusion.*.param must be eps|x0|v"),
    ("diffusion.audio.param", lambda v: v in {"eps", "x0", "v"},
     "diffusion.*.param must be eps|x0|v"),
    ("video.arch", lambda v: v in {"conv", "patch"},
     "video.arch must be conv|patch"),
    ("parallel.context_flash", lambda v: isinstance(v, bool),
     "parallel.context_flash must be a bool"),
    ("model.core.quant", lambda v: v in {"none", "int8"},
     "model.core.quant must be none|int8"),
    ("sampling.sampler", lambda v: v in {"ddim", "dpmpp_2m"},
     "sampling.sampler must be ddim|dpmpp_2m"),
    ("training.sync_loss_weight", lambda v: float(v) >= 0.0,
     "sync_loss_weight must be >= 0"),
    ("training.sync_tau", lambda v: float(v) > 0.0,
     "sync_tau must be > 0"),
]

CROSS_RULES = [
    (lambda c: int(_get(c, "tokenizer.width") or 0)
     == int(_get(c, "model.core.d_model") or -1),
     "tokenizer.width must equal model.core.d_model"),
    (lambda c: _get(c, "model.heads.video.out_dim") is None or
     int(_get(c, "model.heads.video.out_dim")) ==
     int(_get(c, "video.latent.channels"))
     * int(_get(c, "tokenizer.video.tube.t"))
     * int(_get(c, "tokenizer.video.tube.h"))
     * int(_get(c, "tokenizer.video.tube.w")),
     "heads.video.out_dim must equal Cv * tube.t * tube.h * tube.w"),
    (lambda c: _get(c, "model.heads.audio.out_dim") is None or
     int(_get(c, "model.heads.audio.out_dim")) ==
     int(_get(c, "audio.latent.channels"))
     * int(_get(c, "tokenizer.audio.chunk.length")),
     "heads.audio.out_dim must equal Ca * chunk.length"),
    (lambda c: int(_get(c, "model.core.d_model"))
     % int(_get(c, "model.core.n_heads")) == 0,
     "d_model must be divisible by n_heads"),
    (lambda c: not _get(c, "conditioning.mouth_crop.enabled") or (
        0 <= int(_get(c, "conditioning.mouth_crop.box")[0])
        < int(_get(c, "conditioning.mouth_crop.box")[1])
        <= int(_get(c, "video.size")[0])
        and 0 <= int(_get(c, "conditioning.mouth_crop.box")[2])
        < int(_get(c, "conditioning.mouth_crop.box")[3])
        <= int(_get(c, "video.size")[1])
        and (int(_get(c, "conditioning.mouth_crop.box")[1])
             - int(_get(c, "conditioning.mouth_crop.box")[0]))
        % int(_get(c, "conditioning.mouth_crop.tube.h") or 8) == 0
        and (int(_get(c, "conditioning.mouth_crop.box")[3])
             - int(_get(c, "conditioning.mouth_crop.box")[2]))
        % int(_get(c, "conditioning.mouth_crop.tube.w") or 8) == 0),
     "conditioning.mouth_crop.box must lie inside video.size and divide "
     "its tube h/w"),
    (lambda c: not _get(c, "parallel.context_flash")
     or int(_get(c, "parallel.context") or 1) > 1,
     "parallel.context_flash requires parallel.context > 1"),
    # the ring bodies have no cross-device-consistent RNG for per-prob
    # dropout; mmdit raises at trace time, this catches it at config time
    (lambda c: int(_get(c, "parallel.context") or 1) <= 1
     or float(_get(c, "model.core.attn_dropout") or 0.0) == 0.0,
     "parallel.context > 1 requires model.core.attn_dropout == 0"),
    # pipelined stages skip the lcm(seq_multiple, n_ctx) sequence padding
    # (the stage ring carries no masks), so under pipe the context ring
    # would silently fall back to dense attention — a perf/memory cliff,
    # not a capability; reject the combination at config time
    (lambda c: int(_get(c, "parallel.pipe") or 1) <= 1
     or int(_get(c, "parallel.context") or 1) <= 1,
     "parallel.pipe > 1 cannot be combined with parallel.context > 1 "
     "(pipelined stages skip the CP sequence padding; the ring would "
     "silently degrade to dense attention)"),
    # with the diffusion gradient stopped at the encoder outputs,
    # reconstruction is the encoders' ONLY training signal — without it
    # they would never train at all
    (lambda c: not _get(c, "model.encoder_stopgrad")
     or float(_get(c, "training.recon_loss_weight") or 0.0) > 0.0,
     "model.encoder_stopgrad requires training.recon_loss_weight > 0"),
    # the mouth-rate sync loss reads the mouth conditioning stream's
    # contextualized tokens — without the stream there is nothing to sync
    (lambda c: _get(c, "training.sync_loss_source") != "mouth"
     or float(_get(c, "training.sync_loss_weight") or 0.0) == 0.0
     or bool(_get(c, "conditioning.mouth_crop.enabled")),
     "training.sync_loss_source: mouth requires "
     "conditioning.mouth_crop.enabled: true"),
]


def _get(cfg: Dict, dotted: str):
    cur: Any = cfg
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def validate(cfg: Dict) -> List[str]:
    errors = []
    for key in BASE_REQUIRED:
        if _get(cfg, key) is None:
            errors.append(f"missing required key: {key}")
    for key, rule, msg in RULES:
        v = _get(cfg, key)
        if v is not None:
            try:
                if not rule(v):
                    errors.append(f"{key}={v!r}: {msg}")
            except Exception as e:
                errors.append(f"{key}={v!r}: {msg} ({e})")
    if not errors:
        for rule, msg in CROSS_RULES:
            try:
                if not rule(cfg):
                    errors.append(msg)
            except Exception:
                pass  # cross rules only apply when their keys exist
    return errors


def main(argv=None) -> int:
    paths = (argv if argv is not None else sys.argv[1:]) or [
        str(Path(__file__).parent / "mvp.yaml")
    ]
    # overlays (a2v/v2a) are validated merged onto mvp like the CLIs use them
    base = Path(__file__).parent / "mvp.yaml"
    ok = True
    for p in paths:
        p = Path(p)
        merged = [p] if p.name == "mvp.yaml" else [base, p]
        cfg = load_config(*merged)
        errors = validate(cfg)
        if errors:
            ok = False
            print(f"[FAIL] {p}:")
            for e in errors:
                print(f"   - {e}")
        else:
            print(f"[ok] {p}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
