"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initialises its backends, so this lives at
conftest import time (pytest imports conftest before test modules).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

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
