"""Minimal `librosa` stand-in for running the PyTorch reference on this box.

The reference dataset only calls `librosa.resample(y, orig_sr=..,
target_sr=..)` when a wav's sample rate mismatches the config (reference
avdiff/datasets/av_manifest.py:118).  Our preprocessing always writes the
target rate, so this is a safety net; linear interpolation is plenty for it.
"""

from __future__ import annotations

import numpy as np


def resample(y, *, orig_sr: int, target_sr: int, **_kw):
    if orig_sr == target_sr:
        return y
    n_out = int(round(len(y) * target_sr / orig_sr))
    x_old = np.linspace(0.0, 1.0, num=len(y), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, y).astype(y.dtype)
