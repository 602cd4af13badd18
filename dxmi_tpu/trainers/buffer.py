"""Trajectory replay buffer with a regular (K, T, B, ...) layout.

The reference appends each trajectory's transitions to flat tensors with a
``timestep`` column and recovers per-timestep rows with ``nonzero`` masking
(/root/reference/models/DxMI/trainer.py:23-70, 270-327). The layout is
regular by construction — exactly B rows per timestep per trajectory — so
on TPU we keep the (T, B) structure explicit: no concatenation, no boolean
masking, and static shapes under jit.

K is the number of stacked trajectories (the reference's ``n_critic``
accumulation between sampler updates).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrajectoryBuffer:
    """Stacked trajectories. Leading axes: (K, T, B)."""

    state: jnp.ndarray        # (K, T, B, H, W, C)  x_t
    next_state: jnp.ndarray   # (K, T, B, H, W, C)  x_{t+1}
    mean: jnp.ndarray         # (K, T, B, H, W, C)  policy mean
    sigma: jnp.ndarray        # (K, T, B)           policy std
    logp: jnp.ndarray         # (K, T, B)
    entropy: jnp.ndarray      # (K, T, B)
    y: Optional[jnp.ndarray]  # (K, T, B) int32 class labels, or None

    @property
    def n_traj(self) -> int:
        return self.state.shape[0]

    @property
    def n_timesteps(self) -> int:
        return self.state.shape[1]

    @property
    def batch_size(self) -> int:
        return self.state.shape[2]

    def last(self) -> "TrajectoryBuffer":
        """The most recent trajectory, K=1 (the reference's TD sweep only
        consumes the newest B*T rows, trainer.py:271-272)."""
        return jax.tree.map(lambda a: a[-1:], self)

    def flat(self) -> Dict[str, jnp.ndarray]:
        """Flatten to (K*T*B, ...) rows plus a timestep vector — the view
        the sampler update samples minibatches from."""
        K, T, B = self.state.shape[:3]
        N = K * T * B

        def f(a):
            return a.reshape(N, *a.shape[3:])

        t = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :, None], (K, T, B))
        out = {
            "state": f(self.state),
            "next_state": f(self.next_state),
            "mean": f(self.mean),
            "sigma": f(self.sigma),
            "logp": f(self.logp),
            "entropy": f(self.entropy),
            "timestep": t.reshape(N),
        }
        if self.y is not None:
            out["y"] = f(self.y)
        return out


def from_d_sample(d_sample: Dict[str, jnp.ndarray]) -> TrajectoryBuffer:
    """Build a K=1 buffer from a sampler's d_sample dict
    (the ``append_buffer`` equivalent, trainer.py:23-55)."""
    l_sample = d_sample["l_sample"]  # (T+1, B, H, W, C)
    y = d_sample.get("y")
    T = l_sample.shape[0] - 1
    B = l_sample.shape[1]
    if y is not None:
        y = jnp.broadcast_to(y[None, :], (T, B))[None]
    return TrajectoryBuffer(
        state=l_sample[None, :-1],
        next_state=l_sample[None, 1:],
        mean=d_sample["mean"][None],
        sigma=_ensure_tb(d_sample["sigma"])[None],
        logp=d_sample["logp"][None],
        entropy=_ensure_tb(d_sample.get("entropy", jnp.log(_ensure_tb(d_sample["sigma"]))))[None],
        y=y,
    )


def _ensure_tb(a: jnp.ndarray) -> jnp.ndarray:
    """Accept (T, B) or (T, B, 1, 1, 1)-broadcast arrays; return (T, B)."""
    if a.ndim == 2:
        return a
    return a.reshape(a.shape[0], a.shape[1], -1)[..., 0]


def concat(*buffers: TrajectoryBuffer) -> TrajectoryBuffer:
    """Stack trajectories along K (the reference's repeated append between
    sampler updates when n_critic > 1)."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *buffers)
