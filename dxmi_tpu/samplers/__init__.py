"""Sampler (policy) wrappers.

Each sampler is a thin static container (network module + frozen schedule +
flags) exposing pure functions:

  * ``sample_step(params, x, t, key, ...) -> d_step`` — one stochastic
    denoising step, differentiable wrt params (the policy-gradient path),
  * ``sample(params, key, n) -> d_sample``    — the full T-step trajectory
    as a single ``lax.scan``.

The d_step/d_sample dict contracts mirror the reference
(/root/reference/models/DxMI/var_sampler.py:357-428), with trajectory
tensors stacked on a leading (T, ...) axis instead of Python lists.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_many(sampler, params, key, n_batches: int, batch: int, **kw):
    """Generate ``n_batches`` trajectories' final samples in ONE dispatch
    (a lax.scan over whole sample() calls). This is the production shape
    for bulk generation (FID, npz packing): per-call dispatch latency is
    amortized across n_batches * batch images.

    Returns (n_batches, batch, H, W, C).
    """
    keys = jax.random.split(key, n_batches)

    def body(carry, k):
        return carry, sampler.sample(params, k, batch, **kw)["sample"]

    _, out = jax.lax.scan(body, 0, keys)
    return out
