"""Sharding helpers: map flax logical axis metadata onto the mesh.

Model code annotates parameters with logical axes (models/mmdit.py uses
'embed'/'heads'/'mlp' via `nn.with_logical_partitioning`); this module turns
those annotations into `NamedSharding`s under LOGICAL_RULES, and provides the
batch sharding used to split host arrays across the 'data' axis.  XLA then
inserts the ICI collectives (psum for grads, all-gathers for TP) — nothing is
hand-scheduled, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from flax import linen as nn
from flax.core import meta
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import LOGICAL_RULES


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; trailing dims replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def infer_param_shardings(mesh: Mesh, params_with_meta: Any) -> Any:
    """Abstract params (with flax Partitioned metadata) -> NamedSharding tree.

    Leaves without metadata are replicated.  Uses LOGICAL_RULES to translate
    logical names ('heads', 'mlp', ...) to mesh axes.
    """
    logical = nn.get_partition_spec(params_with_meta)
    mesh_specs = nn.logical_to_mesh(logical, rules=LOGICAL_RULES)

    def to_sharding(spec):
        if not isinstance(spec, P):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(
        to_sharding, mesh_specs,
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )


def unbox(tree: Any) -> Any:
    """Strip flax Partitioned boxes, returning raw arrays."""
    return meta.unbox(tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put a host batch with the leading axis split over 'data'.

    Per-array: arrays whose first dim can't split (scalars) are replicated.
    """
    n_data = mesh.shape["data"]

    def put(x):
        if not isinstance(x, jax.Array):
            # device arrays (e.g. the device-resident gather path) must NOT
            # round-trip through the host: np.asarray would pull them back
            x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)
