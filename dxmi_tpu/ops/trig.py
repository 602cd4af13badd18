"""Accurate float32 sin/cos for large arguments.

XLA's float32 trig range reduction drifts ~1e-3 at arguments of ~1000 rad
— exactly the regime of sinusoidal timestep embeddings (t up to 1000 on
the DDPM grid, |rescaled_t| up to ~1550 on the EDM grid). A 3-term
Cody-Waite reduction mod 2*pi keeps k*hi exact for |k| <= ~2^8 and
restores ~1e-7 accuracy, matching the PyTorch reference's sleef-computed
values for converted-checkpoint parity.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * math.pi
_TP_HI = np.float32(np.trunc(_TWO_PI * 2**13) / 2**13)
_TP_MID = np.float32(_TWO_PI - float(_TP_HI))
_TP_LO = np.float32(_TWO_PI - float(_TP_HI) - float(_TP_MID))


def reduce_mod_2pi(x: jnp.ndarray) -> jnp.ndarray:
    k = jnp.floor(x / jnp.float32(_TWO_PI))
    return ((x - k * _TP_HI) - k * _TP_MID) - k * _TP_LO


def sin(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sin(reduce_mod_2pi(x))


def cos(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.cos(reduce_mod_2pi(x))
