#!/usr/bin/env python3
"""Latent-scale / latent-collapse probe for a trained A<->V checkpoint.

    python tools/latent_probe.py --config configs/mvp.yaml overlay.yaml \
        [--n 8] [--ema] [--device cpu] [--out probe.json]

Round-3 context (PERFORMANCE.md "Specificity v1"): the v1 run failed because
the jointly-trained audio encoder collapsed its latent scale (z_audio std
0.005) — the x0 objective was then solvable without reading the conditioning.
v2 adds `model.latent_rmsnorm` (per-sample rms(z) == 1), which removes the
*scale* collapse direction but not the *information* collapse direction: the
encoder could still map every clip to the same unit-rms latent.  This probe
measures both, cheaply (encoders only — no sampling), so a 5k-step checkpoint
answers "is v2 working?" hours before a full held-out eval:

  * rms_per_sample   mean per-clip rms(z) — with latent_rmsnorm on this must
                     be ~1.0 by construction (sanity check the fix is active)
  * across_clip_std  std of z across clips, averaged over positions — the
                     v1 failure mode shows ~0 here even at healthy rms
  * pairwise_cos     mean |cosine| between different clips' flattened latents
                     — collapse to a shared latent shows ~1.0; informative
                     per-clip latents sit well below

A healthy v2 checkpoint: rms_per_sample ~= 1, pairwise_cos clearly < 1, and
across_clip_std within an order of magnitude of 1/sqrt(dim)-scaled rms.
Reference capability context: the encoders being probed implement
/root/reference/avdiff/models/encoders/{vae_video3d.py,audio_codec.py}
semantics (this diagnostic itself has no reference counterpart).
"""

from __future__ import annotations

import argparse
import json
import sys
from itertools import combinations
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _stats(z: np.ndarray) -> dict:
    """z: [n_clips, ...] latent batch -> collapse diagnostics."""
    n = z.shape[0]
    flat = z.reshape(n, -1).astype(np.float64)
    rms = np.sqrt((flat**2).mean(axis=1))
    across = flat.std(axis=0).mean()
    cosines = []
    for i, j in combinations(range(n), 2):
        a, b = flat[i], flat[j]
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 0:
            cosines.append(abs(float(a @ b) / denom))
    return {
        "rms_per_sample_mean": float(rms.mean()),
        "rms_per_sample_min": float(rms.min()),
        "rms_per_sample_max": float(rms.max()),
        "std_global": float(flat.std()),
        "across_clip_std": float(across),
        "pairwise_cos_mean": float(np.mean(cosines)) if cosines else None,
        "pairwise_cos_max": float(np.max(cosines)) if cosines else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    import jax

    from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset
    from multimodal_diffusion_tpu.infer.sample_clip import (
        build_components, select_device,
    )
    from multimodal_diffusion_tpu.utils.io import load_config

    select_device(args.device)
    cfg = load_config(*args.config)
    ds = AVClipsDataset(
        manifest_path=cfg["data"]["train_split_glob"],
        clip_seconds=float(cfg["data"]["clip_seconds"]),
        fps=int(cfg["video"]["fps"]), sr=int(cfg["audio"]["sr"]),
        size_hw=tuple(cfg["video"]["size"]),
        video_root=cfg.get("paths", {}).get("video_root"),
        audio_root=cfg.get("paths", {}).get("audio_root"),
        device_preprocess=True,
    )
    n = min(args.n, len(ds))
    if n < 2:
        sys.exit("need >= 2 clips for collapse diagnostics")
    idxs = list(range(len(ds) - n, len(ds)))  # same held-out tail as eval

    model, params = build_components(cfg, use_ema=args.ema)
    var = {"params": params}

    import jax.numpy as jnp

    frames = np.stack([np.asarray(ds[i]["video"]) for i in idxs])
    wavs = np.stack([np.asarray(ds[i]["audio"]).reshape(-1) for i in idxs])

    x = jnp.asarray(frames, jnp.float32).transpose(0, 4, 1, 2, 3) / 255.0
    t_div = int(model.cfg.vae.t_down)
    T_crop = (x.shape[2] // t_div) * t_div
    if T_crop != x.shape[2]:
        s0 = (x.shape[2] - T_crop) // 2
        x = x[:, :, s0:s0 + T_crop]
    z_v = np.asarray(jax.device_get(
        model.apply(var, x, method=model.encode_video)))
    z_a = np.asarray(jax.device_get(
        model.apply(var, jnp.asarray(wavs, jnp.float32)[:, None, :],
                    method=model.encode_audio)))

    report = {
        "n_clips": n,
        "ema": bool(args.ema),
        "latent_rmsnorm": bool(
            (cfg.get("model", {}) or {}).get("latent_rmsnorm", False)),
        "z_video": _stats(z_v),
        "z_audio": _stats(z_a),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
