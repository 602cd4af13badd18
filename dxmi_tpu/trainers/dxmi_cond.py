"""Conditional DxMI trainer — ImageNet64 / LSUN variant.

Algorithm parity with ``DxMI_Trainer_Cond``
(/root/reference/models/DxMI/trainer.py:412-860). Differences from the
base trainer, all expressed as configuration of the shared jitted
programs:

  * time-independent value, optional class conditioning plumbed into both
    the value and the (class-conditional EDM) policy,
  * ``beta_ordering`` defaults to 'forward' (trainer.py:492-493),
  * entropy may be rescaled (``sigma_scale``) and weighted
    (``entropy_value_scale``) inside the TD target,
  * the policy update sweeps EVERY buffered minibatch and does not clip
    gradients (the reference's mixed-precision path,
    trainer.py:693-746) — bf16 + a non-finite-update guard replaces the
    fp16 loss-scaling machinery,
  * RAdam for the sampler (train_image_large.py:162-168).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from dxmi_tpu.trainers.dxmi import DxMIState, DxMITrainer
from dxmi_tpu.trainers.buffer import TrajectoryBuffer


class DxMITrainerCond(DxMITrainer):
    def __init__(self, *args, beta_ordering: str = "forward", **kwargs):
        super().__init__(*args, beta_ordering=beta_ordering, **kwargs)
        self.sampler_grad_clip = None
        self.nan_guard = True
        self.sampler_optimizer = "radam"

    def init_betas_for_q(self, sampler_params=None):
        import jax.numpy as jnp

        if self.use_sampler_beta:
            if hasattr(self.sampler, "user_defined_eta"):
                return jnp.asarray(self.sampler.user_defined_eta, jnp.float32)
            if hasattr(self.sampler, "betas_for_q_default"):
                # EDM policy: betas_for_q = sigmas^2 (trainer.py:516-517)
                return jnp.asarray(self.sampler.betas_for_q_default)
            raise ValueError("use_sampler_beta requires a sampler schedule")
        return super().init_betas_for_q(sampler_params)

    def update_sampler(self, state: DxMIState, buffer: TrajectoryBuffer,
                       key: jax.Array, n_generator: Optional[int] = None
                       ) -> Tuple[DxMIState, dict]:
        # default: full-buffer sweep (trainer.py:700)
        return super().update_sampler(state, buffer, key, n_generator)

    def sample_guidance(self, state: DxMIState, key: jax.Array, n_sample: int,
                        guidance_scale: Optional[float] = None,
                        x0=None, t_select=None, i_class=None, y=None):
        """Value-guided sampling, conditional/EDM variant
        (trainer.py:811-860): draws a random class label per sample (the
        reference hard-codes 1000 classes; here the sampler's
        ``num_classes``) and delegates to the base implementation, which
        scales the prior by the policy's sigma_max and threads ``y``
        through every ``sample_step``. The value itself is queried
        unconditionally, as in the reference (``self.v.module(next_x,
        tt+1)`` — no ``y``)."""
        import jax.numpy as jnp

        key, ky = jax.random.split(key)
        if y is None and getattr(self.sampler, "class_cond", False):
            if i_class is None:
                n_classes = int(getattr(self.sampler, "num_classes", 0)
                                or 1000)
                y = jax.random.randint(ky, (n_sample,), 0, n_classes)
            elif jnp.ndim(i_class) == 0:
                y = jnp.full((n_sample,), i_class, jnp.int32)
            else:
                y = jnp.asarray(i_class, jnp.int32)
        return super().sample_guidance(state, key, n_sample,
                                       guidance_scale=guidance_scale, x0=x0,
                                       t_select=t_select, y=y)
