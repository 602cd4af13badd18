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


def batch_run_grad(fn: Callable, x: np.ndarray, batch_size: int = 100,
                   flatten: bool = False, **kwargs) -> np.ndarray:
    """Per-sample input-gradient norms of a scalar-per-sample function —
    the reference's gradient-norm uncertainty measure
    (/root/reference/utils.py:75-99). ``fn`` maps a batch ``(B, ...)`` to
    per-sample scalars ``(B,)``; returns ``(N,)`` of ||d fn_i / d x_i||_2.
    JAX-native: one ``jax.grad`` through the batch (the sum trick makes
    per-sample grads independent), chunked like :func:`batch_run`."""
    import jax.numpy as jnp

    def gnorm(chunk, **kw):
        if flatten:
            chunk = chunk.reshape(len(chunk), -1)
        g = jax.grad(lambda c: jnp.sum(fn(c, **kw)))(
            jnp.asarray(chunk, jnp.float32))
        return jnp.sqrt(jnp.sum(g.reshape(len(g), -1) ** 2, axis=1))

    return batch_run(gnorm, x, batch_size=batch_size, **kwargs)


def weight_norm(params) -> float:
    """Global L2 norm of a parameter pytree."""
    return float(np.sqrt(sum(
        float((np.asarray(p) ** 2).sum()) for p in jax.tree.leaves(params))))
