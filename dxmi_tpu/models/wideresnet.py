"""Wide ResNet value network (the configs/lsun/T4_wide.yaml target,
``models.wideresnet_te.wideresnet.Wide_ResNet`` — module absent from the
reference snapshot, SURVEY.md §2.0; reconstructed from the standard
Wide-ResNet-16-10 recipe with the config's ``norm: group4`` option).

``__call__(x_nhwc) -> (B, num_classes)``; used with num_classes=1 as a
time-independent value head.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm(norm: Optional[str], dtype):
    if norm is None or norm == "none":
        return lambda name: (lambda x: x)
    if norm.startswith("group"):
        groups = int(norm[len("group"):] or 32)
        def f(name):
            gn = nn.GroupNorm(num_groups=groups, dtype=jnp.float32, name=name)
            return lambda x: gn(x.astype(jnp.float32)).astype(dtype)
        return f
    raise ValueError(f"unsupported norm for TPU build: {norm}")


class WideBasic(nn.Module):
    features: int
    stride: int = 1
    dropout: float = 0.0
    norm: Optional[str] = "group4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        make_norm = _norm(self.norm, self.dtype)
        h = make_norm("norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = make_norm("norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        dtype=self.dtype, name="shortcut")(x)
        return x + h


class WideResNet(nn.Module):
    depth: int = 16
    widen_factor: int = 10
    num_classes: int = 1
    dropout: float = 0.0
    norm: Optional[str] = "group4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert (self.depth - 4) % 6 == 0, "depth must be 6n+4"
        n = (self.depth - 4) // 6
        k = self.widen_factor
        widths = [16, 16 * k, 32 * k, 64 * k]

        x = x.astype(self.dtype)
        h = nn.Conv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        for group, width in enumerate(widths[1:], start=1):
            for i in range(n):
                stride = 2 if (group > 1 and i == 0) else 1
                h = WideBasic(width, stride, self.dropout, self.norm,
                              dtype=self.dtype,
                              name=f"block{group}_{i}")(
                    h, deterministic=deterministic)
        h = _norm(self.norm, self.dtype)("norm_out")(h)
        h = jax.nn.silu(h).astype(jnp.float32)
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="linear")(h)
