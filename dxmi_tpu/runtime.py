"""Process-level JAX runtime setup shared by every entry point.

Must be called BEFORE the first backend touch (the container's
sitecustomize pins ``jax_platforms`` to the axon TPU; ``DXMI_PLATFORM``
is the only override that works — the JAX_PLATFORMS env var is ignored).
"""
from __future__ import annotations

import os

import jax

_DONE = False


def init_runtime(cache_dir: str | None = None) -> None:
    """Apply DXMI_PLATFORM override + persistent compilation cache.

    The cache (default ``<repo>/.jax_cache``, override via
    ``DXMI_CACHE_DIR``, disable with ``DXMI_CACHE_DIR=``) makes repeat
    entry invocations skip the slow first compile — on the TPU path the
    remote compile of a scanned U-Net is 20-40 s, and CPU smoke-test
    compiles of the trainers run into minutes.
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    plat = os.environ.get("DXMI_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if plat == "cpu":
        # XLA:CPU AOT cache entries are machine-feature-pinned and loading
        # them cross-feature warns "could lead to execution errors such as
        # SIGILL" — CPU smoke runs skip the persistent cache entirely.
        return
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DXMI_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    if cache_dir:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except (OSError, AttributeError):
            pass  # read-only FS / old jax: run without the cache
