"""Value-function wrappers.

``TimeIndependentValue`` gives any image->scalar network the
``(x, t[, y])`` interface the trainers expect while ignoring ``t``
(reference /root/reference/models/value.py:3-15).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class TimeIndependentValue(nn.Module):
    """Wraps a time-independent network as ``V(x, t[, y])``."""

    net: nn.Module

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None, **kwargs) -> jnp.ndarray:
        if y is not None:
            return self.net(x, y, **kwargs)
        return self.net(x, **kwargs)
