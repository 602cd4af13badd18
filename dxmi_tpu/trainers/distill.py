"""Karras diffusion training losses: DSM, consistency & progressive
distillation.

Capability parity with the reference ``KarrasDenoiser`` loss surface
(/root/reference/models/cm/karras_diffusion.py): ``get_weightings``
(:18-31), ``get_snr`` (:58-59), ``training_losses`` (:82-107),
``consistency_losses`` (:108-240), ``progdist_losses`` (:243-334). These
are unused by the DxMI algorithm itself (SURVEY.md §2.0 marks them dead in
the live paths) but complete the denoiser's public API for consistency /
progressive distillation training.

TPU-native mechanics: pure functions over explicit ``(net, params)`` pairs
and PRNG keys — jittable and grad-able as-is. The reference's
torch-RNG-state save/restore trick, which makes the online and target
networks consume the *same dropout draw* (karras_diffusion.py:192-201),
becomes simply passing both calls the same dropout key; ``.detach()``
becomes ``lax.stop_gradient``. Teacher (frozen-solver) forwards always run
deterministic, matching the reference's ``@th.no_grad`` eval-mode teachers.

The reference snapshot's ``lpips`` loss norm is dead code (the ``piq``
import is commented out at karras_diffusion.py:10, so ``loss_norm='lpips'``
NameErrors at init); it is rejected here with an explicit error.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dxmi_tpu.schedules import append_dims
from dxmi_tpu.trainers.dxmi import mean_flat


def create_ema_and_scales_fn(target_ema_mode: str, start_ema: float,
                             scale_mode: str, start_scales: int,
                             end_scales: int, total_steps: int,
                             distill_steps_per_iter: int = 0):
    """Step -> (target_ema, num_scales) schedule for consistency /
    progressive-distillation training (script_util.py:161-219). Host-side
    scalar math; the returned values feed ``consistency_losses`` /
    ``progdist_losses`` and the target-net EMA rate."""
    import numpy as np

    def progressive_scales(step: int) -> int:
        # sqrt ramp from start_scales to end_scales+1 over total_steps
        s = np.sqrt((step / total_steps)
                    * ((end_scales + 1) ** 2 - start_scales ** 2)
                    + start_scales ** 2)
        return int(max(np.ceil(s) - 1, 1)) + 1

    def ema_and_scales_fn(step: int):
        mode = (target_ema_mode, scale_mode)
        if mode == ("fixed", "fixed"):
            return float(start_ema), int(start_scales)
        if mode == ("fixed", "progressive"):
            return float(start_ema), progressive_scales(step)
        if mode == ("adaptive", "progressive"):
            scales = progressive_scales(step) - 1
            c = -np.log(start_ema) * start_scales
            return float(np.exp(-c / scales)), scales + 1
        if mode == ("fixed", "progdist"):
            # halve the scale count each distillation stage; once at 2,
            # sub-stages step 2 -> 1 (script_util.py:198-213)
            stage = step // distill_steps_per_iter
            scales = max(start_scales // (2 ** stage), 2)
            if scales == 2:
                sub_stage = int(max(
                    step - distill_steps_per_iter
                    * (np.log2(start_scales) - 1), 0)
                ) // (distill_steps_per_iter * 2)
                scales = max(2 // (2 ** sub_stage), 1)
            return 1.0, int(scales)
        raise NotImplementedError(mode)

    return ema_and_scales_fn


def get_snr(sigmas: jnp.ndarray) -> jnp.ndarray:
    """SNR of the EDM forward process at noise level sigma
    (karras_diffusion.py:58-59)."""
    return sigmas ** -2.0


def get_weightings(weight_schedule: str, snrs: jnp.ndarray,
                   sigma_data: float) -> jnp.ndarray:
    """Per-sample loss weights (karras_diffusion.py:18-31)."""
    if weight_schedule == "snr":
        return snrs
    if weight_schedule == "snr+1":
        return snrs + 1.0
    if weight_schedule == "karras":
        return snrs + 1.0 / sigma_data ** 2
    if weight_schedule == "truncated-snr":
        return jnp.maximum(snrs, 1.0)
    if weight_schedule == "uniform":
        return jnp.ones_like(snrs)
    raise NotImplementedError(f"unknown weight_schedule {weight_schedule!r}")


def _resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    # NHWC; half-pixel-center bilinear = torch F.interpolate(align_corners=False)
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


def _norm_loss(loss_norm: str, pred: jnp.ndarray, target: jnp.ndarray,
               weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted distillation loss (karras_diffusion.py:206-237, :311-331)."""
    if loss_norm == "l1":
        return mean_flat(jnp.abs(pred - target)) * weights
    if loss_norm == "l2":
        return mean_flat((pred - target) ** 2) * weights
    if loss_norm == "l2-32":
        pred = _resize_bilinear(pred, 32)
        target = _resize_bilinear(target, 32)
        return mean_flat((pred - target) ** 2) * weights
    if loss_norm == "lpips":
        raise ValueError(
            "loss_norm='lpips' is dead code in the reference snapshot (the "
            "piq import is commented out, karras_diffusion.py:10); use "
            "'l1', 'l2' or 'l2-32'")
    raise ValueError(f"unknown loss norm {loss_norm!r}")


def _karras_t(diffusion, frac: jnp.ndarray) -> jnp.ndarray:
    """rho-interpolated sigma at fractional grid position ``frac`` in [0,1]
    (the t/t2/t3 expressions at karras_diffusion.py:180-188, :286-301)."""
    smax_r = diffusion.sigma_max ** (1.0 / diffusion.rho)
    smin_r = diffusion.sigma_min ** (1.0 / diffusion.rho)
    return (smax_r + frac * (smin_r - smax_r)) ** diffusion.rho


def training_losses(diffusion, net, params, x_start: jnp.ndarray,
                    sigmas: jnp.ndarray, key: Optional[jax.Array] = None,
                    y=None, noise: Optional[jnp.ndarray] = None,
                    train: bool = False) -> Dict[str, jnp.ndarray]:
    """Denoising score-matching loss at given noise levels
    (karras_diffusion.py:82-107). Returns {'xs_mse', 'mse', 'loss'}."""
    dims = x_start.ndim
    k_noise = k_drop = None
    if key is not None:
        k_noise, k_drop = jax.random.split(key)
    if noise is None:
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
    x_t = x_start + noise * append_dims(sigmas, dims)
    _, denoised = diffusion.denoise(net, params, x_t, sigmas, y,
                                    train=train, dropout_rng=k_drop)
    weights = get_weightings(diffusion.weight_schedule, get_snr(sigmas),
                             diffusion.sigma_data)
    terms = {
        "xs_mse": mean_flat((denoised - x_start) ** 2),
        "mse": mean_flat(append_dims(weights, dims)
                         * (denoised - x_start) ** 2),
    }
    terms["loss"] = terms["mse"]
    return terms


def consistency_losses(diffusion, net, params, target_params,
                       x_start: jnp.ndarray, num_scales: int, key: jax.Array,
                       *, teacher_net=None, teacher_params=None,
                       teacher_diffusion=None, y=None,
                       noise: Optional[jnp.ndarray] = None,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
    """Consistency-distillation / consistency-training loss
    (karras_diffusion.py:108-240).

    With a teacher: the adjacent-scale point ``x_t2`` comes from one Heun
    step of the teacher ODE (:144-161); without one (consistency
    *training*), from an Euler step using ``x_start`` as the denoiser
    (:163-170). The target network (EMA of the online net, required — the
    reference raises without it, :135) is evaluated at ``x_t2`` and
    stop-gradiented.
    """
    if target_params is None:
        raise ValueError("Must have a target model")  # karras_diffusion.py:135
    dims = x_start.ndim
    k_noise, k_idx, k_drop = jax.random.split(key, 3)
    if noise is None:
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
    indices = jax.random.randint(k_idx, (x_start.shape[0],), 0,
                                 num_scales - 1).astype(jnp.float32)
    t = _karras_t(diffusion, indices / (num_scales - 1))
    t2 = _karras_t(diffusion, (indices + 1) / (num_scales - 1))

    x_t = x_start + noise * append_dims(t, dims)
    dropout_rng = k_drop if train else None
    _, distiller = diffusion.denoise(net, params, x_t, t, y, train=train,
                                     dropout_rng=dropout_rng)

    if teacher_net is None:
        # consistency training: Euler solve toward x_start (:163-170, :196-197)
        d = (x_t - x_start) / append_dims(t, dims)
        x_t2 = x_t + d * append_dims(t2 - t, dims)
    else:
        td = teacher_diffusion if teacher_diffusion is not None else diffusion
        # consistency distillation: one Heun step of the teacher (:144-161)
        denoiser = td.denoise(teacher_net, teacher_params, x_t, t, y)[1]
        d = (x_t - denoiser) / append_dims(t, dims)
        samples = x_t + d * append_dims(t2 - t, dims)
        denoiser2 = td.denoise(teacher_net, teacher_params, samples, t2, y)[1]
        next_d = (samples - denoiser2) / append_dims(t2, dims)
        x_t2 = x_t + (d + next_d) * append_dims((t2 - t) / 2.0, dims)
    x_t2 = jax.lax.stop_gradient(x_t2)

    # same dropout key as the online forward — the reference restores the
    # torch RNG state before this call (karras_diffusion.py:192-201)
    _, distiller_target = diffusion.denoise(net, target_params, x_t2, t2, y,
                                            train=train,
                                            dropout_rng=dropout_rng)
    distiller_target = jax.lax.stop_gradient(distiller_target)

    weights = get_weightings(diffusion.weight_schedule, get_snr(t),
                             diffusion.sigma_data)
    loss_norm = getattr(diffusion, "loss_norm", "l2")
    return {"loss": _norm_loss(loss_norm, distiller, distiller_target,
                               weights)}


def progdist_losses(diffusion, net, params, x_start: jnp.ndarray,
                    num_scales: int, key: jax.Array, *, teacher_net,
                    teacher_params, teacher_diffusion=None, y=None,
                    noise: Optional[jnp.ndarray] = None,
                    train: bool = False) -> Dict[str, jnp.ndarray]:
    """Progressive-distillation loss (karras_diffusion.py:243-334): the
    student at sigma ``t`` regresses the denoiser implied by two teacher
    Euler half-steps (t -> t2 -> t3)."""
    dims = x_start.ndim
    k_noise, k_idx, k_drop = jax.random.split(key, 3)
    if noise is None:
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
    indices = jax.random.randint(k_idx, (x_start.shape[0],), 0,
                                 num_scales).astype(jnp.float32)
    t = _karras_t(diffusion, indices / num_scales)
    t2 = _karras_t(diffusion, (indices + 0.5) / num_scales)
    t3 = _karras_t(diffusion, (indices + 1.0) / num_scales)

    x_t = x_start + noise * append_dims(t, dims)
    _, denoised_x = diffusion.denoise(net, params, x_t, t, y, train=train,
                                      dropout_rng=k_drop if train else None)

    td = teacher_diffusion if teacher_diffusion is not None else diffusion

    def euler(x, s, s_next):
        den = td.denoise(teacher_net, teacher_params, x, s, y)[1]
        d = (x - den) / append_dims(s, dims)
        return x + d * append_dims(s_next - s, dims)

    x_t2 = jax.lax.stop_gradient(euler(x_t, t, t2))
    x_t3 = jax.lax.stop_gradient(euler(x_t2, t2, t3))
    # euler_to_denoiser (karras_diffusion.py:305-310)
    target_x = jax.lax.stop_gradient(
        x_t - append_dims(t, dims) * (x_t3 - x_t) / append_dims(t3 - t, dims))

    weights = get_weightings(diffusion.weight_schedule, get_snr(t),
                             diffusion.sigma_data)
    loss_norm = getattr(diffusion, "loss_norm", "l2")
    if loss_norm == "l2-32":  # progdist supports l1/l2/lpips only (:311-331)
        raise ValueError("loss_norm 'l2-32' is not supported by "
                         "progdist_losses (karras_diffusion.py:311-331)")
    return {"loss": _norm_loss(loss_norm, denoised_x, target_x, weights)}
