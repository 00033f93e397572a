"""Sliding-window A->V / V->A generation with crossfade stitching.

Parity with the reference `avdiff/models/infer/stream_infer.py` (which
shipped with a broken import and could never run — SURVEY §2.12.1): slice the
prompt into window_seconds windows at hop_seconds, sample the other modality
per window, stitch with cosine-crossfade overlap-add for audio
(stream_infer.py:82-112) and triangular alpha-blend for video (115-143).
Windowing/stitching are host-side numpy — they're O(output size) and not
TPU-critical.

TPU-native design: the model is built ONCE and the scan sampler is compiled
ONCE per direction (sample_clip.get_sampler jit cache); windows ride the
sampler's batch axis in fixed-size chunks of `streaming.max_batch_windows`
(default 8, last chunk padded to the same shape), so N windows cost
ceil(N/B) device calls and exactly one trace.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Tuple

import numpy as np

from ..media.audio_io import read_wav, write_wav
from ..media.video_io import load_frames_dir, write_frames
from ..utils.io import ensure_dir, load_config
from .sample_clip import build_components, select_device


# ---------------------------------------------------------------------------
# windowing
# ---------------------------------------------------------------------------


def split_audio_into_windows(
    y: np.ndarray, sr: int, win_s: float, hop_s: float
) -> Tuple[np.ndarray, int, int]:
    """[L] -> ([N, win], win, hop); last window zero-padded."""
    L = len(y)
    win = int(round(sr * win_s))
    hop = int(round(sr * hop_s))
    if L <= win:
        pad = np.pad(y, (0, win - L)) if L < win else y
        return pad[None, :], win, hop
    chunks = []
    start = 0
    while start < L:
        end = min(L, start + win)
        seg = y[start:end]
        if len(seg) < win:
            seg = np.pad(seg, (0, win - len(seg)))
        chunks.append(seg)
        if end == L:
            break
        start += hop
    return np.stack(chunks, axis=0), win, hop


def split_frames_into_windows(
    frames: np.ndarray, fps: int, win_s: float, hop_s: float
) -> Tuple[np.ndarray, int, int]:
    """[T, H, W, 3] -> ([N, win, H, W, 3], win, hop); pads by repeating the
    last frame (reference stream_infer.py:60-79)."""
    T = frames.shape[0]
    win = int(round(fps * win_s))
    hop = int(round(fps * hop_s))
    if T <= win:
        if T < win:
            pad = np.repeat(frames[-1:], win - T, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        return frames[None, ...], win, hop
    chunks = []
    start = 0
    while start < T:
        end = min(T, start + win)
        seg = frames[start:end]
        if seg.shape[0] < win:
            pad = np.repeat(seg[-1:], win - seg.shape[0], axis=0)
            seg = np.concatenate([seg, pad], axis=0)
        chunks.append(seg)
        if end == T:
            break
        start += hop
    return np.stack(chunks, axis=0), win, hop


# ---------------------------------------------------------------------------
# crossfade stitching
# ---------------------------------------------------------------------------


def crossfade_audio(
    chunks: np.ndarray, sr: int, hop: int, win: int, fade_s: float
) -> np.ndarray:
    """[N, L] -> stitched [L_total] with cosine fades at window edges."""
    N, L = chunks.shape
    fade = int(round(sr * fade_s))
    w = np.ones(L, dtype=np.float32)
    if fade > 0:
        ramp = 0.5 * (1.0 - np.cos(np.linspace(0, np.pi, fade, dtype=np.float32)))
        w[:fade] = ramp           # fade-in
        w[-fade:] = ramp[::-1]    # fade-out
    y = np.zeros((N - 1) * hop + L, dtype=np.float32)
    norm = np.zeros_like(y)
    for i in range(N):
        a = i * hop
        y[a : a + L] += chunks[i] * w
        norm[a : a + L] += w
    return (y / np.maximum(norm, 1e-6)).astype(np.float32)


def crossfade_video(chunks: np.ndarray, hop: int, win: int, fade_f: int) -> np.ndarray:
    """[N, T, H, W, 3] uint8 -> stitched frames with triangular alpha blend."""
    N, L, H, W, C = chunks.shape
    w = np.ones((L, 1, 1, 1), dtype=np.float32)
    fade = int(fade_f)
    if fade > 0:
        ramp = np.linspace(0, 1, fade, dtype=np.float32)
        w[:fade] *= ramp.reshape(-1, 1, 1, 1)
        w[-fade:] *= ramp[::-1].reshape(-1, 1, 1, 1)
    out = np.zeros(((N - 1) * hop + L, H, W, C), dtype=np.float32)
    norm = np.zeros((out.shape[0], 1, 1, 1), dtype=np.float32)
    for i in range(N):
        a = i * hop
        out[a : a + L] += chunks[i].astype(np.float32) / 255.0 * w
        norm[a : a + L] += w
    out = out / np.maximum(norm, 1e-6)
    return (np.clip(out, 0, 1) * 255.0).astype(np.uint8)


# ---------------------------------------------------------------------------
# batched window sampling
# ---------------------------------------------------------------------------


def sample_windows_batched(
    chunks: np.ndarray,
    *,
    cfg,
    model,
    params,
    prompt_modality: str,
    max_batch: int,
) -> np.ndarray:
    """Run all N windows through the batched scan sampler in ceil(N/B)
    device calls.  The last chunk is padded (repeating the final window) to
    the same batch shape so the jit cache sees exactly one trace."""
    from .sample_clip import sample_one_direction

    N = chunks.shape[0]
    B = max(1, min(int(max_batch), N))
    outs = []
    for a in range(0, N, B):
        batch = chunks[a : a + B]
        pad = B - batch.shape[0]
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        kw = {"prompt_video": batch} if prompt_modality == "video" else {
            "prompt_audio": batch}
        key = "audio" if prompt_modality == "video" else "video"
        out = sample_one_direction(
            cfg=cfg, model=model, params=params,
            prompt_modality=prompt_modality, **kw,
        )[key]
        outs.append(out[: out.shape[0] - pad] if pad else out)
    return np.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Sliding-window AV generation with crossfade stitching."
    )
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--frames", type=Path, default=None,
                    help="Prompt frames dir (for V->A)")
    ap.add_argument("--audio", type=Path, default=None,
                    help="Prompt audio wav (for A->V)")
    ap.add_argument("--out-dir", type=Path, default=Path("stream_out"))
    ap.add_argument("--save-mp4", type=Path, default=None)
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--ema", action="store_true")
    args = ap.parse_args(argv)

    select_device(args.device)
    cfg = load_config(*args.config)
    stream = cfg.get("streaming", {}) or {}
    win_s = float(stream.get("window_seconds", 3.0))
    hop_s = float(stream.get("hop_seconds", 1.0))
    xfade_s = float(stream.get("crossfade_seconds", 0.25))
    max_batch = int(stream.get("max_batch_windows", 8))
    fps = int(cfg["video"]["fps"])
    sr = int(cfg["audio"]["sr"])
    prompt_modality = cfg.get("sampling", {}).get("prompt_modality", "video")

    model, params = build_components(cfg, use_ema=args.ema)
    ensure_dir(args.out_dir)

    if prompt_modality == "video":
        if args.frames is None:
            raise SystemExit("Provide --frames for prompt_modality=video")
        H, W = (int(x) for x in cfg["video"]["size"])
        frames_all = load_frames_dir(args.frames, size_hw=(H, W))
        chunks, _, _ = split_frames_into_windows(frames_all, fps, win_s, hop_s)
        outs = sample_windows_batched(
            chunks, cfg=cfg, model=model, params=params,
            prompt_modality="video", max_batch=max_batch,
        )
        wav = crossfade_audio(
            outs, sr=sr,
            hop=int(round(sr * hop_s)), win=int(round(sr * win_s)),
            fade_s=xfade_s,
        )
        wav_path = args.out_dir / "stream_audio.wav"
        write_wav(wav_path, wav, sr)
        print(f"[ok] wrote {wav_path}")
    else:
        if args.audio is None:
            raise SystemExit("Provide --audio for prompt_modality=audio")
        wav_all, _ = read_wav(args.audio, sr=sr)
        chunks, _, _ = split_audio_into_windows(wav_all, sr, win_s, hop_s)
        outs = sample_windows_batched(
            chunks, cfg=cfg, model=model, params=params,
            prompt_modality="audio", max_batch=max_batch,
        )
        frames = crossfade_video(
            outs,
            hop=int(round(fps * hop_s)), win=int(round(fps * win_s)),
            fade_f=int(round(xfade_s * fps)),
        )
        frames_dir = args.out_dir / "frames"
        write_frames(frames, frames_dir, mp4_path=args.save_mp4, fps=fps)
        print(f"[ok] wrote frames -> {frames_dir}")
        if args.save_mp4:
            print(f"[ok] wrote mp4 -> {args.save_mp4}")


if __name__ == "__main__":
    main()
