"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend in every
python process and pins ``jax_platforms='axon,cpu'``, overriding the
JAX_PLATFORMS env var — so tests must force CPU via jax.config *after*
import but *before* any backend initialisation. XLA flags must also be in
place before the CPU client spins up.

Mixing torch and the axon TPU client in one process can deadlock a 1-CPU
box; keep OMP single-threaded for the cross-check tests.
"""
import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

# Persistent compile cache: CPU test compiles (hundreds of jitted
# programs over the virtual 8-device mesh) dominated the 28-minute
# round-1 suite; cached reruns skip them.
_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
_CACHE.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = pathlib.Path("/root/reference")

requires_reference = pytest.mark.skipif(
    not REFERENCE.exists(),
    reason="reference repo not mounted; cross-check tests skipped",
)


@pytest.fixture(scope="session")
def reference_path():
    return REFERENCE
