"""Shared bench-script bootstrap: repo import path + the persistent XLA
compile cache (first compile over the remote-compile tunnel is slow;
later runs hit the cache). Import this before anything from dxmi_tpu."""
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
