"""Config + file I/O helpers.

Capability parity with the reference's `avdiff/utils/io.py` (see reference
io.py:36-146): atomic text/bytes writes, JSON/YAML load/save, recursive
deep-merge, and multi-file left->right config loading.  Two deliberate
upgrades over the reference:

  * ``${VAR}`` / ``${VAR:-default}`` environment expansion is applied when
    configs are *loaded* (the reference only implemented it inside the
    standalone validator, so the sampler read literal ``${...}`` strings —
    reference validate_config.py:104-114 vs io.py:77-88).
  * checkpoint-adjacent JSON metadata writes are atomic as well.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from pathlib import Path
from typing import Any, Dict, Union

import numpy as np
import yaml

PathLike = Union[str, os.PathLike]

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")


# ---------------------------------------------------------------------------
# paths / atomic writes
# ---------------------------------------------------------------------------

def ensure_dir(path: PathLike) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def atomic_write_text(path: PathLike, text: str, encoding: str = "utf-8") -> None:
    dest = Path(path)
    ensure_dir(dest.parent)
    fd, tmp_name = tempfile.mkstemp(dir=dest.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding=encoding) as tmp:
            tmp.write(text)
            tmp.flush()
            os.fsync(tmp.fileno())
        os.replace(tmp_name, dest)
    except BaseException:
        if os.path.exists(tmp_name):
            os.unlink(tmp_name)
        raise


def atomic_write_bytes(path: PathLike, data: bytes) -> None:
    dest = Path(path)
    ensure_dir(dest.parent)
    fd, tmp_name = tempfile.mkstemp(dir=dest.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as tmp:
            tmp.write(data)
            tmp.flush()
            os.fsync(tmp.fileno())
        os.replace(tmp_name, dest)
    except BaseException:
        if os.path.exists(tmp_name):
            os.unlink(tmp_name)
        raise


# ---------------------------------------------------------------------------
# JSON / YAML / NPZ
# ---------------------------------------------------------------------------

def load_json(path: PathLike) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def save_json(path: PathLike, obj: Any, *, indent: int = 2, sort_keys: bool = False) -> None:
    atomic_write_text(path, json.dumps(obj, indent=indent, sort_keys=sort_keys))


def load_yaml(path: PathLike) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def save_yaml(path: PathLike, obj: Dict[str, Any]) -> None:
    atomic_write_text(path, yaml.safe_dump(obj, sort_keys=False))


def save_npz(path: PathLike, **arrays: np.ndarray) -> None:
    ensure_dir(Path(path).parent)
    np.savez_compressed(path, **arrays)


def load_npz(path: PathLike) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


# ---------------------------------------------------------------------------
# config merge + env expansion
# ---------------------------------------------------------------------------

def deep_update(base: Dict[str, Any], upd: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge `upd` into `base` (mutates and returns `base`)."""
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def expand_env(obj: Any) -> Any:
    """Expand ``${VAR}`` and ``${VAR:-default}`` in every string leaf."""
    if isinstance(obj, str):
        def sub(m: re.Match) -> str:
            var, default = m.group(1), m.group(2)
            return os.environ.get(var, default if default is not None else m.group(0))
        return _ENV_RE.sub(sub, obj)
    if isinstance(obj, dict):
        return {k: expand_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [expand_env(v) for v in obj]
    return obj


def load_config(*paths: PathLike, expand: bool = True) -> Dict[str, Any]:
    """Load + deep-merge YAML/JSON configs, left->right precedence.

    Mirrors the reference CLI contract (`--config a.yaml b.yaml`,
    reference io.py:130-146) and additionally expands environment templating.
    """
    cfg: Dict[str, Any] = {}
    for p in paths:
        p = Path(p)
        if not p.exists():
            raise FileNotFoundError(p)
        if p.suffix.lower() in {".yaml", ".yml"}:
            part = load_yaml(p)
        elif p.suffix.lower() == ".json":
            part = load_json(p)
        else:
            raise ValueError(f"Unsupported config format: {p}")
        deep_update(cfg, part or {})
    if expand:
        cfg = expand_env(cfg)
    return cfg
