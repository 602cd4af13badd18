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

    import os
    unroll = int(os.environ.get("DXMI_OUTER_UNROLL", "1"))
    _, out = jax.lax.scan(body, 0, keys, unroll=unroll)
    return out


# d_sample leaves whose BATCH axis is axis 0; every other leaf carries a
# leading (T,)/(T+1,) time axis with batch at axis 1 (contract in the
# module docstring / var_sampler.py:411-428)
_BATCH_AXIS0 = ("sample", "logp_terminal", "y")


def sample_chunked(sampler, params, key, n_sample: int, n_chunks: int, **kw):
    """Full-contract trajectory sampling in ``n_chunks`` sequential chunks
    inside ONE program (a lax.scan over whole sample() calls), merged back
    along the batch axis.

    Why: the per-step working set scales with batch, and the measured
    throughput optimum is batch ~64 (PERF.md shape sweep; confirmed in the
    params-as-arguments training regime by
    scripts/bench_train_sample_chunk.py: 64x16 is +9% over 128x8). The
    training batch (128) is above the optimum, so the trainer's sampling
    phase chunks it. Distributionally identical to one big batch (fresh
    fold of ``key`` per chunk); NOT bitwise-identical.
    """
    # class labels: sample() calls them i_class (EDMSampler contract)
    y = kw.pop("y", None)
    if n_chunks <= 1:
        if y is not None:
            kw["i_class"] = y
        return sampler.sample(params, key, n_sample, **kw)
    if n_sample % n_chunks:
        raise ValueError(f"n_sample={n_sample} not divisible by "
                         f"n_chunks={n_chunks}")
    b = n_sample // n_chunks
    keys = jax.random.split(key, n_chunks)

    if y is None:
        def body(carry, k):
            return carry, sampler.sample(params, k, b, **kw)
        _, ds = jax.lax.scan(body, 0, keys)
    else:
        ys = jnp.reshape(jnp.asarray(y), (n_chunks, b) + jnp.shape(y)[1:])

        def body(carry, xs):
            k, yy = xs
            return carry, sampler.sample(params, k, b, i_class=yy, **kw)
        _, ds = jax.lax.scan(body, 0, (keys, ys))

    def merge(name, a):
        if a is None:
            return None
        if name in _BATCH_AXIS0:
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
        a = jnp.moveaxis(a, 0, 1)          # (T, nc, b, ...)
        return a.reshape((a.shape[0], a.shape[1] * a.shape[2]) + a.shape[3:])

    return {k: merge(k, v) for k, v in ds.items()}
