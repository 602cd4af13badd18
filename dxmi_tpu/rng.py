"""Deterministic, batch-size- and topology-invariant RNG.

Capability parity with /root/reference/models/cm/random_util.py:28-95
(``DeterministicGenerator``): sample i of a num_samples-sized eval draw
gets the same noise regardless of batch size and world size. JAX's
counter-based PRNG makes this exact and trivial: fold the GLOBAL sample
index into a base key.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def per_sample_keys(base_key: jax.Array, start_index: int, n: int) -> jax.Array:
    """Keys for global sample indices [start, start+n)."""
    idx = jnp.arange(start_index, start_index + n)
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(idx)


def deterministic_randn(base_key: jax.Array, start_index: int, n: int,
                        shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """(n, *shape) normal draws, equal for equal global indices no matter
    how the batch is sliced."""
    keys = per_sample_keys(base_key, start_index, n)
    return jax.vmap(lambda k: jax.random.normal(k, tuple(shape), dtype))(keys)


def deterministic_randint(base_key: jax.Array, start_index: int, n: int,
                          low: int, high: int) -> jnp.ndarray:
    keys = per_sample_keys(base_key, start_index, n)
    return jax.vmap(lambda k: jax.random.randint(k, (), low, high))(keys)


def get_generator(kind: str, num_samples: int = 0, seed: int = 0):
    """Reference-shaped factory ('dummy' | 'determ' | 'determ-indiv')."""
    base = jax.random.key(seed)

    class _Gen:
        def __init__(self):
            self._offset = 0

        def randn(self, *shape, dtype=jnp.float32, device=None):
            n = shape[0]
            if kind == "dummy":
                nonlocal base
                base, k = jax.random.split(base)
                return jax.random.normal(k, shape, dtype)
            out = deterministic_randn(base, self._offset, n, shape[1:], dtype)
            self._offset = (self._offset + n) % max(num_samples, 1)
            return out

        def randint(self, low, high, shape, dtype=jnp.int32, device=None):
            n = shape[0]
            if kind == "dummy":
                nonlocal base
                base, k = jax.random.split(base)
                return jax.random.randint(k, shape, low, high)
            out = deterministic_randint(base, self._offset, n, low, high)
            self._offset = (self._offset + n) % max(num_samples, 1)
            return out

    if kind not in ("dummy", "determ", "determ-indiv"):
        raise ValueError(f"unknown generator kind: {kind}")
    return _Gen()
