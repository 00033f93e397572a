#!/usr/bin/env python3
"""Quality evaluation of a trained A<->V checkpoint on real clips.

    python tools/eval_av_quality.py --config configs/mvp.yaml overlay.yaml \
        [--n 16] [--ema] [--seed 0] [--out report.json]

For --n manifest clips (held out by taking them from the END of the
manifest): generate audio from the clip's video (V->A, 50-step DDIM+CFG),
then report, vs the BASELINE.md quality-parity row:

  * av_sync_corr_gen:    motion-envelope correlation of GENERATED audio
                         with the prompt video (eval/av_sync)
  * av_sync_corr_real:   same for the ground-truth audio (upper anchor)
  * av_sync_corr_shuf:   generated audio vs an UNRELATED clip's video
                         (chance anchor)
  * logmel_l1 / spec_mse: spectrogram distance generated-vs-ground-truth
  * logmel_l1_shuf:      distance to a shuffled ground truth (anchor)

A model that learned real cross-modal structure shows
corr_shuf < corr_gen <= corr_real and logmel_l1 < logmel_l1_shuf.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--cond-sensitivity", action="store_true", default=True,
                    help="also sample once with MISMATCHED video prompts "
                         "(same noise) and report how different the audio "
                         "is — 0 means conditioning is ignored")
    ap.add_argument("--no-cond-sensitivity", dest="cond_sensitivity",
                    action="store_false")
    args = ap.parse_args(argv)

    from multimodal_diffusion_tpu.datasets.av_manifest import AVClipsDataset
    from multimodal_diffusion_tpu.eval.av_sync import estimate_av_sync
    from multimodal_diffusion_tpu.eval.audio_quality import (
        logmel_l1, spectral_convergence,
    )
    from multimodal_diffusion_tpu.infer.sample_clip import (
        build_components, sample_one_direction, select_device,
    )
    from multimodal_diffusion_tpu.utils.io import load_config

    select_device(args.device)
    cfg = load_config(*args.config)
    sr = int(cfg["audio"]["sr"])
    fps = int(cfg["video"]["fps"])

    ds = AVClipsDataset(
        manifest_path=cfg["data"]["train_split_glob"],
        clip_seconds=float(cfg["data"]["clip_seconds"]),
        fps=fps, sr=sr, size_hw=tuple(cfg["video"]["size"]),
        video_root=cfg.get("paths", {}).get("video_root"),
        audio_root=cfg.get("paths", {}).get("audio_root"),
        device_preprocess=True,  # uint8 [T, H, W, 3]
    )
    n = min(args.n, len(ds))
    if n == 0:
        sys.exit("manifest is empty — nothing to evaluate")
    idxs = list(range(len(ds) - n, len(ds)))  # tail = held-out-ish slice

    model, params = build_components(cfg, use_ema=args.ema)

    frames_list, real_wavs = [], []
    for i in idxs:
        it = ds[i]
        frames_list.append(np.asarray(it["video"]))  # [T, H, W, 3] u8
        real_wavs.append(np.asarray(it["audio"]).reshape(-1))

    # batched V->A generation (one trace)
    batch = np.stack(frames_list)
    out = sample_one_direction(
        cfg=cfg, model=model, params=params, prompt_modality="video",
        prompt_video=batch,
        rng=__import__("jax").random.PRNGKey(args.seed),
    )
    gen_wavs = out["audio"]  # [n, L]

    gen_wavs_mis = None
    if args.cond_sensitivity and n > 1:
        # conditioning-sensitivity probe: same seed/noise, MISMATCHED video
        # (batch rolled by 1).  A model that ignores its conditioning
        # produces bit-identical audio for both prompts -> sensitivity 0;
        # a model that reads the video produces different audio.  This
        # isolates "does conditioning flow?" from the (noisy) question
        # "is the generated envelope correlated with THIS clip's motion?"
        out_mis = sample_one_direction(
            cfg=cfg, model=model, params=params, prompt_modality="video",
            prompt_video=np.roll(batch, 1, axis=0),
            rng=__import__("jax").random.PRNGKey(args.seed),
        )
        gen_wavs_mis = out_mis["audio"]

    rows = []
    rng = np.random.default_rng(args.seed)
    for j in range(n):
        frames = frames_list[j]
        real = real_wavs[j]
        gen = gen_wavs[j]
        _, corr_gen = estimate_av_sync(frames, gen, sr=sr, fps=fps)
        _, corr_real = estimate_av_sync(frames, real, sr=sr, fps=fps)
        row = {
            "av_sync_corr_gen": corr_gen,
            "av_sync_corr_real": corr_real,
            "logmel_l1": logmel_l1(real, gen, sr),
            "spec_convergence": spectral_convergence(real, gen, sr),
        }
        if n > 1:  # shuffle anchors need a *different* clip to exist
            k = int(rng.integers(0, n - 1))
            other = (j + 1 + k) % n  # a different clip
            _, corr_shuf = estimate_av_sync(frames_list[other], gen, sr=sr,
                                            fps=fps)
            row["av_sync_corr_shuf"] = corr_shuf
            row["logmel_l1_shuf"] = logmel_l1(real_wavs[other], gen, sr)
            # metric CEILING anchor: the same shuffle applied to the REAL
            # audio.  If corr_real - corr_real_shuf is small, envelope
            # correlation cannot separate matched from mismatched clips on
            # this corpus even for ground truth, and the retrieval metric
            # below is the honest specificity readout.
            _, corr_real_shuf = estimate_av_sync(frames_list[other], real,
                                                 sr=sr, fps=fps)
            row["av_sync_corr_real_shuf"] = corr_real_shuf
            # top-1 retrieval: does the generated audio sit closer (logmel
            # L1) to ITS OWN clip's real audio than to every other clip's?
            # chance = 1/n; per-clip specificity directly, no envelope proxy
            dists = [logmel_l1(real_wavs[m], gen, sr) for m in range(n)]
            row["retrieval_top1"] = float(int(np.argmin(dists)) == j)
            row["retrieval_margin"] = float(
                np.min([dists[m] for m in range(n) if m != j]) - dists[j])
        if gen_wavs_mis is not None:
            row["cond_sensitivity_logmel"] = logmel_l1(
                gen, gen_wavs_mis[j], sr)
            row["cond_sensitivity_wav_l2"] = float(
                np.sqrt(np.mean((gen - gen_wavs_mis[j]) ** 2)))
        rows.append(row)

    report = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    report["n_clips"] = n
    report["ema"] = bool(args.ema)
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps({"mean": report, "per_clip": rows},
                                       indent=2))


if __name__ == "__main__":
    main()
