#!/usr/bin/env python3
"""preprocess_audio.py — audio preprocessing for the AV corpus.

Capability parity with the reference `scripts/preprocess_audio.py:51-302`:
  mode=wav: resample a tree of audio files to mono target-sr WAVs (the
            training path consumes these through the codec;
            configs `audio.representation: "codec"`).
  mode=mel: per-clip log-mel NPZ files + manifest, optionally aligned to a
            video manifest's clip windows (--align-to).
librosa/soundfile are replaced by media/audio_io (scipy-based).

Usage:
  python scripts/preprocess_audio.py --input data/audio/raw --output data/audio/wav16k \
      --mode wav --sr 16000 [--rms-norm]
  python scripts/preprocess_audio.py --input data/audio/wav16k --output data/audio/mel \
      --mode mel --sr 16000 --n-mels 80 [--align-to data/video/frames/x/clips.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_diffusion_tpu.media.audio_io import (  # noqa: E402
    logmel, read_wav, rms_normalize, write_wav,
)

AUDIO_EXTS = {".wav", ".flac", ".mp3", ".ogg", ".m4a"}
# MPEG program streams (GRID corpus raw clips): audio demuxed + MP2-decoded
# via media/mpeg_audio (reference preprocess_audio.py:144-157 extracts the
# same track through librosa/ffmpeg)
MPEG_EXTS = {".mpg", ".mpeg", ".m2v"}


def iter_audio(root: Path):
    if root.is_file():
        yield root
    else:
        yield from sorted(
            p for p in root.rglob("*")
            if p.suffix.lower() in (AUDIO_EXTS | MPEG_EXTS)
        )


def _read_any(src: Path, sr: int):
    if src.suffix.lower() in MPEG_EXTS:
        from multimodal_diffusion_tpu.media.mpeg_audio import read_mpeg_audio

        return read_mpeg_audio(src, sr=sr, mono=True)
    return read_wav(src, sr=sr, mono=True)


def mode_wav(args) -> None:
    n = 0
    for src in iter_audio(args.input):
        y, _ = _read_any(src, args.sr)
        if args.rms_norm:
            y = rms_normalize(y)
        rel = src.relative_to(args.input) if not args.input.is_file() else src.name
        dst = (args.output / rel).with_suffix(".wav")
        write_wav(dst, y, args.sr)
        n += 1
    print(f"[done] wrote {n} wavs -> {args.output}")


def mode_mel(args) -> None:
    align = None
    if args.align_to:
        align = json.loads(Path(args.align_to).read_text())["clips"]
    entries = []
    n = 0
    for src in iter_audio(args.input):
        y, _ = _read_any(src, args.sr)
        if align is not None:
            # window audio to each aligned video clip
            for ci, clip in enumerate(align):
                secs = float(clip.get("clip_seconds", args.clip_seconds))
                a = int(round(ci * secs * args.sr))
                b = a + int(round(secs * args.sr))
                seg = y[a:b]
                if len(seg) == 0:
                    break
                if len(seg) < b - a:
                    seg = np.pad(seg, (0, (b - a) - len(seg)))
                M = logmel(seg, args.sr, n_fft=args.n_fft, hop=args.hop,
                           n_mels=args.n_mels, fmin=args.fmin, fmax=args.fmax)
                dst = args.output / f"{src.stem}_clip_{ci:04d}.npz"
                dst.parent.mkdir(parents=True, exist_ok=True)
                np.savez_compressed(dst, logmel=M, sr=args.sr)
                entries.append({"mel_path": str(dst), "clip_index": ci,
                                "source_audio": str(src)})
                n += 1
        else:
            M = logmel(y, args.sr, n_fft=args.n_fft, hop=args.hop,
                       n_mels=args.n_mels, fmin=args.fmin, fmax=args.fmax)
            dst = args.output / f"{src.stem}.npz"
            dst.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(dst, logmel=M, sr=args.sr)
            entries.append({"mel_path": str(dst), "source_audio": str(src)})
            n += 1
    (args.output / "mel_manifest.json").write_text(
        json.dumps({"clips": entries}, indent=2)
    )
    print(f"[done] wrote {n} mel npz -> {args.output}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="Audio preprocessing (wav | mel).")
    ap.add_argument("--input", "--in", dest="input", type=Path, default=None)
    ap.add_argument("--output", "--out", dest="output", type=Path, default=None)
    # reference-compatible aliases (preprocess_audio.py:269-270)
    ap.add_argument("--input_path", dest="input_alias", type=Path, default=None)
    ap.add_argument("--output_dir", dest="output_alias", type=Path, default=None)
    ap.add_argument("--mode", type=str, default="wav", choices=["wav", "mel"])
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--rms-norm", "--norm-rms", dest="rms_norm",
                    action="store_true")
    ap.add_argument("--n-mels", type=int, default=80)
    ap.add_argument("--n-fft", type=int, default=1024)
    ap.add_argument("--hop", "--hop-length", dest="hop", type=int, default=256)
    ap.add_argument("--fmin", type=float, default=0.0)
    ap.add_argument("--fmax", type=float, default=None)
    ap.add_argument("--clip-seconds", type=float, default=3.0)
    ap.add_argument("--align-to", type=Path, default=None,
                    help="Video clips.json to window the audio against")
    args = ap.parse_args(argv)
    args.input = args.input or args.input_alias
    args.output = args.output or args.output_alias
    if args.input is None or args.output is None:
        ap.error("supply --input/--output (or --input_path/--output_dir)")
    args.output.mkdir(parents=True, exist_ok=True)
    (mode_wav if args.mode == "wav" else mode_mel)(args)


if __name__ == "__main__":
    main()
