"""FSDP-style parameter sharding over a mesh axis.

The reference replicates all models (DDP); SURVEY.md §2.1 reserves
fully-sharded parameters as the TPU-native option for when the LSUN-256
EDM model + Adam state pressures HBM. Implementation: annotate each
parameter leaf with a NamedSharding that shards its LARGEST
axis-divisible dimension along ``axis``; XLA inserts the all-gathers on
use and reduce-scatters on gradients under jit.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_sharding_for(mesh: Mesh, a, axis: str = "fsdp",
                      min_size: int = 2 ** 14) -> NamedSharding:
    """Sharding for one array: biggest dimension divisible by the axis
    size gets sharded; small arrays stay replicated."""
    n = mesh.shape[axis]
    if n == 1 or np.prod(a.shape) < min_size:
        return NamedSharding(mesh, P())
    dims = sorted(range(a.ndim), key=lambda d: -a.shape[d])
    for d in dims:
        if a.shape[d] % n == 0 and a.shape[d] >= n:
            spec = [None] * a.ndim
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params_fsdp(mesh: Mesh, params: Any, axis: str = "fsdp",
                      min_size: int = 2 ** 14) -> Any:
    """device_put every leaf with its FSDP sharding."""
    return jax.tree.map(
        lambda a: jax.device_put(a, fsdp_sharding_for(mesh, a, axis, min_size)),
        params)


def sharding_tree(mesh: Mesh, params: Any, axis: str = "fsdp",
                  min_size: int = 2 ** 14) -> Any:
    """The matching pytree of shardings (for jit in_shardings/out_shardings)."""
    return jax.tree.map(
        lambda a: fsdp_sharding_for(mesh, a, axis, min_size), params)
