"""Minimal `soundfile` stand-in for running the PyTorch reference on this box.

The reference's AVClipsDataset (reference avdiff/datasets/av_manifest.py:112)
only calls `sf.read(path, always_2d=False)` on 16-bit PCM wavs produced by
our scripts/preprocess_audio.py; the real libsndfile wheel is not installed
in this image.  Decodes via the wave stdlib module — no reference code is
copied, and the reference package is untouched (this dir is simply put on
sys.path ahead of it by tools/train_reference.py).
"""

from __future__ import annotations

import wave

import numpy as np


def read(path, always_2d: bool = False, dtype="float64"):
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        y = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        y = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif sw == 1:
        y = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        y = y.reshape(-1, ch)
        if not always_2d:
            pass  # multi-channel stays 2-D, matching soundfile semantics
    elif always_2d:
        y = y[:, None]
    return y.astype(dtype), sr
