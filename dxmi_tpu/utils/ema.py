"""EMA parameter tracking (parity with cm/nn.update_ema and the EMA/scale
schedules in cm/script_util.py:161-219 used for consistency training)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def update_ema(ema_params, params, rate: float = 0.9999):
    """ema <- ema * rate + params * (1 - rate), elementwise over the tree."""
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate),
                        ema_params, params)


def ema_and_scales_fn(target_ema_mode: str = "fixed",
                      start_ema: float = 0.95,
                      scale_mode: str = "fixed",
                      start_scales: int = 40, end_scales: int = 40,
                      total_steps: int = 600_000, distill_steps_per_iter: int = 50_000):
    """Consistency-training EMA/scale schedules (cm/script_util.py:161-219)."""
    import numpy as np

    def fn(step):
        if target_ema_mode == "fixed" and scale_mode == "fixed":
            return start_ema, start_scales
        if target_ema_mode == "fixed" and scale_mode == "progressive":
            scales = np.ceil(np.sqrt(
                (step / total_steps) * ((end_scales + 1) ** 2 - start_scales ** 2)
                + start_scales ** 2) - 1).astype(np.int32)
            scales = np.maximum(scales, 1) + 1
            return start_ema, int(scales)
        if target_ema_mode == "adaptive" and scale_mode == "progressive":
            scales = np.ceil(np.sqrt(
                (step / total_steps) * ((end_scales + 1) ** 2 - start_scales ** 2)
                + start_scales ** 2) - 1).astype(np.int32)
            scales = np.maximum(scales, 1)
            c = -np.log(start_ema) * start_scales
            target_ema = float(np.exp(-c / scales))
            return target_ema, int(scales) + 1
        raise NotImplementedError((target_ema_mode, scale_mode))

    return fn
