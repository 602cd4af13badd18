"""Misc helpers (parity with the live parts of /root/reference/utils.py:
mkdir_p, batch_run, weight_norm, print0)."""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def print0(*args, **kwargs) -> None:
    if jax.process_index() == 0:
        print(*args, **kwargs, flush=True)


def batch_run(fn: Callable, x: np.ndarray, batch_size: int = 100,
              to_numpy: bool = True, **kwargs):
    """Apply a (jitted) function over a big array in fixed-size chunks,
    padding the tail so every call shares one compiled shape (the
    reference's batch_run re-jits per tail size implicitly; static shapes
    are the TPU-correct behavior)."""
    n = len(x)
    outs = []
    for i in range(0, n, batch_size):
        chunk = x[i:i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        out = fn(chunk, **kwargs)
        out = np.asarray(out) if to_numpy else out
        if pad:
            out = out[:-pad]
        outs.append(out)
    return np.concatenate(outs) if to_numpy else outs


def weight_norm(params) -> float:
    """Global L2 norm of a parameter pytree."""
    return float(np.sqrt(sum(
        float((np.asarray(p) ** 2).sum()) for p in jax.tree.leaves(params))))
