"""Small MLP networks for the paper's 2D experiment.

The reference ships the 2D data/energies (loader/synthetic.py) and trainer
support but not the 2D entry script or its nets (README.md:45-46 marks the
2D experiment TODO; SURVEY.md §2.0). These are the standard diffusion-MLP
shapes for that experiment: sinusoidal-t-conditioned eps-MLP policy and a
(x, t)-MLP value.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dxmi_tpu.models.unet_small import timestep_embedding


class EpsMLP(nn.Module):
    """eps prediction for 2D points: ``__call__(x (B,2), t (B,)) -> (B,2)``."""

    hidden: Sequence[int] = (128, 128, 128)
    in_dim: int = 2
    temb_dim: int = 32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        temb = timestep_embedding(t.astype(jnp.float32), self.temb_dim)
        h = jnp.concatenate([x, temb], axis=-1)
        for i, w in enumerate(self.hidden):
            h = nn.Dense(w, name=f"dense_{i}")(h)
            h = jax.nn.silu(h)
        return nn.Dense(self.in_dim, name="out")(h)


class ValueMLP(nn.Module):
    """(x, t) -> scalar value/energy for 2D points."""

    hidden: Sequence[int] = (128, 128)
    temb_dim: int = 32
    time_dependent: bool = True

    @nn.compact
    def __call__(self, x, t=None, y=None, *, deterministic: bool = True):
        if self.time_dependent and t is not None:
            temb = timestep_embedding(
                jnp.broadcast_to(jnp.asarray(t), (x.shape[0],)).astype(jnp.float32),
                self.temb_dim)
            h = jnp.concatenate([x, temb], axis=-1)
        else:
            h = x
        for i, w in enumerate(self.hidden):
            h = nn.Dense(w, name=f"dense_{i}")(h)
            h = jax.nn.silu(h)
        return nn.Dense(1, name="out")(h)
