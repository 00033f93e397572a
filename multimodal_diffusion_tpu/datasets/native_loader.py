"""ctypes bindings for the native C++ loader (native/avloader.cpp).

Builds `native/build/libavloader.so` on first use (g++ + libjpeg; zero
Python-level deps) and exposes:

  decode_clip(paths, H, W)  -> float32 [3, T, H, W] in [0, 1]
  read_wav_mono(path)       -> (float32 [n], sample_rate)
  available()               -> bool (compiled + loadable)

The Python PIL/scipy path remains the functional fallback; the dataset
switches automatically (datasets/av_manifest.py) unless disabled.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libavloader.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            capture_output=True, text=True, timeout=120,
        )
        return r.returncode == 0 and _SO_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        lib.decode_clip_f32.restype = ctypes.c_int
        lib.decode_clip_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.decode_clip_u8.restype = ctypes.c_int
        lib.decode_clip_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.load_wav_mono.restype = ctypes.c_long
        lib.load_wav_mono.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_clip(paths: Sequence, H: int, W: int,
                n_threads: int = 0) -> np.ndarray:
    """JPEG frame paths -> [3, T, H, W] float32 in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native avloader unavailable")
    T = len(paths)
    if n_threads <= 0:
        n_threads = min(T, os.cpu_count() or 1)
    out = np.empty((3, T, H, W), dtype=np.float32)
    arr = (ctypes.c_char_p * T)(*[str(p).encode() for p in paths])
    rc = lib.decode_clip_f32(
        arr, T, H, W, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed for frame {rc - 1}: "
                           f"{paths[rc - 1]}")
    return out


def decode_clip_u8(paths: Sequence, H: int, W: int,
                   n_threads: int = 0) -> np.ndarray:
    """JPEG frame paths -> [T, H, W, 3] uint8 (device-side normalize path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native avloader unavailable")
    T = len(paths)
    if n_threads <= 0:
        n_threads = min(T, os.cpu_count() or 1)
    out = np.empty((T, H, W, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * T)(*[str(p).encode() for p in paths])
    rc = lib.decode_clip_u8(
        arr, T, H, W, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed for frame {rc - 1}: "
                           f"{paths[rc - 1]}")
    return out


def read_wav_mono(path) -> Tuple[np.ndarray, int]:
    """RIFF/WAV (PCM8/16/32, float32) -> (float32 mono [n], sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native avloader unavailable")
    sr = ctypes.c_int(0)
    n = lib.load_wav_mono(str(path).encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise RuntimeError(f"native wav parse failed: {path}")
    out = np.empty(n, dtype=np.float32)
    got = lib.load_wav_mono(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got < 0:
        raise RuntimeError(f"native wav read failed: {path}")
    return out[:got], int(sr.value)
