"""SPMD mesh utilities — the TPU-native replacement for the reference's
torchrun/DDP/NCCL stack (SURVEY.md §2.1).

The reference's only parallelism is data parallelism: DDP bucket-allreduce
on gradients, DistributedSampler on data, barrier/all_gather for FID
(/root/reference/train_cifar10.py:298-324). Here the same program shape is
expressed as SPMD under jit over a 1-D ``data`` mesh (a second ``fsdp``
axis is reserved for parameter sharding of the larger EDM models):

  * params replicated, batch sharded on ``data`` -> XLA inserts the psum
    for gradient reduction over ICI; no explicit collectives in user code,
  * host-side rank gating via ``jax.process_index() == 0``,
  * barrier via ``multihost_utils.sync_global_devices``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",),
                devices: Optional[Sequence] = None) -> Mesh:
    """1-D (or trailing-1) device mesh over all local+global devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_names))


def data_sharding(mesh: Mesh, batch_axis_index: int = 0, ndim: int = 4,
                  axis: str = "data") -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree: Any, batch_axis_index: int = 0,
                axis: str = "data") -> Any:
    """Put every array in ``tree`` with its batch axis sharded on ``axis``."""

    def put(a):
        a = jax.numpy.asarray(a)
        spec = [None] * a.ndim
        if a.ndim > batch_axis_index:
            spec[batch_axis_index] = axis
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def global_batch(mesh: Mesh, local_tree: Any, batch_axis_index: int = 0,
                 axis: str = "data") -> Any:
    """Assemble per-process local batches into global jax.Arrays sharded on
    ``axis`` — the multi-host replacement for DistributedSampler+DDP input
    handling. Single-process: equivalent to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(mesh, local_tree, batch_axis_index, axis)

    def put(a):
        a = np.asarray(a)
        spec = [None] * a.ndim
        if a.ndim > batch_axis_index:
            spec[batch_axis_index] = axis
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), a)

    return jax.tree.map(put, local_tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def sync_hosts(name: str = "sync") -> None:
    """Barrier across hosts (the reference's torch.distributed.barrier)."""
    if is_multihost():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
