"""Tensor (model) parallelism via GSPMD parameter shardings.

The reference's only strategy is data parallelism (SURVEY.md §2.1, which
reserves a mesh axis for TP as the TPU-native extension). Here TP is
expressed the XLA-native way: annotate each weight with a NamedSharding
that splits its channel dimension over the ``model`` mesh axis and let
GSPMD propagate activation shardings / insert the collectives under jit
— no manual all-reduces, no module surgery (scaling-book recipe).

Pairing follows Megatron: "column-parallel" layers (first conv of a
ResBlock, q/k/v/qkv projections, time-embedding MLPs) shard the OUTPUT
channel dim, so their activations come out sharded on ``model``;
"row-parallel" layers (second conv, attention proj_out, shortcut convs,
output heads) shard the INPUT channel dim, which consumes the sharded
activation and yields a psum back to replicated. Name sets cover both
net families (UNetSmall: conv1/conv2/temb_proj/q,k,v/proj_out/
nin_shortcut — /root/reference/models/DxMI/unet_small.py:79-191;
UNetADM: in_layers_2/out_layers_3/emb_layers_1/qkv/proj_out/
skip_connection — /root/reference/models/cm/unet.py:147-378). Unknown
kernels default to column-parallel; GSPMD keeps any pairing correct,
the names only tune where the collectives land.

Optionally each kernel's OTHER big dim is additionally sharded on the
``fsdp`` axis (2-D weight sharding, Megatron+ZeRO style).
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names whose kernels are row-parallel (shard the input-channel
# dim; output returns to replicated via the GSPMD-inserted psum).
# Path segments are '/'-joined (_path_str), so name boundaries are
# '/' or '_' or string ends — NOT '_' alone (round-1 bug: the '_'-only
# boundaries never matched '/'-delimited segments, silently routing
# every kernel column-parallel).
_ROW_PARALLEL = re.compile(
    r"(^|[/_])(conv2|proj_out|nin_shortcut|skip_connection|out_layers_\d+"
    r"|out_2|out_conv|dense2)($|[/_])")
# names to leave replicated regardless (normalization params are tiny and
# GN group statistics are cheapest computed on full channel vectors)
_REPLICATED = re.compile(r"(^|[/_])(gn|norm\d*|scale_out|label_emb)($|[/_])")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def tp_spec(path, a, n_model: int, axis: str = "model",
            fsdp_axis: Optional[str] = None, n_fsdp: int = 1,
            min_size: int = 2 ** 12) -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    s = _path_str(path)
    if _REPLICATED.search(s) or np.prod(a.shape) < min_size or a.ndim < 1:
        return P()
    row = _ROW_PARALLEL.search(s) is not None
    spec = [None] * a.ndim
    if a.ndim >= 2:
        # kernels: (..., Cin, Cout) for both Conv (HWIO) and Dense (IO)
        tp_dim = a.ndim - 2 if row else a.ndim - 1
        if a.shape[tp_dim] % n_model == 0 and a.shape[tp_dim] >= n_model:
            spec[tp_dim] = axis
        if fsdp_axis is not None and n_fsdp > 1:
            other = a.ndim - 1 if row else a.ndim - 2
            if a.shape[other] % n_fsdp == 0 and a.shape[other] >= n_fsdp:
                spec[other] = fsdp_axis
    else:
        # biases: follow the owning kernel's output sharding —
        # column-parallel biases are per-output-channel shards, row-
        # parallel outputs are replicated after the psum
        if not row and a.shape[0] % n_model == 0 and a.shape[0] >= n_model:
            spec[0] = axis
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def tp_sharding_tree(mesh: Mesh, params: Any, axis: str = "model",
                     fsdp_axis: Optional[str] = None,
                     min_size: int = 2 ** 12) -> Any:
    """Pytree of NamedShardings (for jit in_shardings / device_put)."""
    n_model = mesh.shape[axis]
    n_fsdp = mesh.shape[fsdp_axis] if fsdp_axis is not None else 1
    return jax.tree_util.tree_map_with_path(
        lambda path, a: NamedSharding(
            mesh, tp_spec(path, a, n_model, axis, fsdp_axis, n_fsdp,
                          min_size)),
        params)


def shard_params_tp(mesh: Mesh, params: Any, axis: str = "model",
                    fsdp_axis: Optional[str] = None,
                    min_size: int = 2 ** 12) -> Any:
    """device_put every leaf with its TP (optionally 2-D TP x FSDP)
    sharding; XLA inserts all collectives under jit."""
    shardings = tp_sharding_tree(mesh, params, axis, fsdp_axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
