"""Device mesh construction + logical axis rules.

The reference scales with single-node DDP over NCCL (train_joint.py:28-37,
trainer.py:206-211).  The TPU-native equivalent (SURVEY §2.B) is a
`jax.sharding.Mesh` with named axes:

  'data'    — batch (data parallel); gradient reduction compiles to an XLA
              all-reduce riding ICI — there is no NCCL analog to port.
  'model'   — tensor parallel: attention heads + MLP hidden dims of the MMDiT
              and the noise-head trunks are sharded here (see the logical axis
              annotations in models/mmdit.py).
  'context' — sequence/context parallel (opt-in via `parallel.context: N`):
              MMDiT activations keep the token axis sharded here and
              attention runs as a ppermute ring (ops/ring_attention.py), so
              window length scales past one chip's HBM.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` (the
train CLI does this automatically when JAX coordination env vars are set);
`jax.devices()` then spans all hosts and the same mesh code works unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

# logical axis name -> mesh axis name (None = replicated)
LOGICAL_RULES = (
    ("batch", "data"),
    ("seq", None),
    ("embed", None),
    ("heads", "model"),
    ("mlp", "model"),
    ("kv", None),
)


def make_mesh(
    data: int = -1,
    model: int = 1,
    context: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh, extended with a 'context' axis when
    context > 1 (sequence parallelism) and/or a 'pipe' axis when pipe > 1
    (pipeline parallelism).  A 2-axis mesh stays the default so existing
    specs/checkpoint tooling are unaffected.

    data = -1 consumes all remaining devices after the other axes.  A single
    device yields a trivial mesh so every code path is mesh-agnostic.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, int(model))
    context = max(1, int(context))
    pipe = max(1, int(pipe))
    rest = model * context * pipe
    if data == -1:
        if n % rest:
            raise ValueError(
                f"{n} devices not divisible by model*context*pipe={rest}"
            )
        data = n // rest
    if data * rest > n:
        raise ValueError(
            f"mesh {data}x{model}x{context}x{pipe} needs more than {n} devices"
        )
    # an explicit smaller mesh uses a device subset (useful for tests and
    # for pinning jobs to part of a slice)
    shape = [data, model]
    names = ["data", "model"]
    if context > 1:
        shape.append(context)
        names.append("context")
    if pipe > 1:
        shape.append(pipe)
        names.append("pipe")
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names=tuple(names))


def make_mesh_from_config(cfg: dict, devices=None) -> Mesh:
    par = cfg.get("parallel", {}) or {}
    return make_mesh(
        data=int(par.get("data", -1)),
        model=int(par.get("model", 1)),
        context=int(par.get("context", 1)),
        pipe=int(par.get("pipe", 1)),
        devices=devices,
    )
