"""Karras distillation losses (trainers/distill.py) vs analytic values and
the reference torch implementation (models/cm/karras_diffusion.py:18-334)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.samplers.edm import KarrasDenoiser
from dxmi_tpu.trainers import distill
from tests.conftest import requires_reference


class TinyNet(nn.Module):
    """t-sensitive linear net usable through KarrasDenoiser.denoise."""

    @nn.compact
    def __call__(self, x, t, y=None, deterministic=True):
        w = self.param("w", nn.initializers.ones, ())
        return x * w + 0.01 * t.reshape(-1, 1, 1, 1)


def _setup(w=1.0, **kw):
    net = TinyNet()
    params = {"w": jnp.asarray(w, jnp.float32)}
    diffusion = KarrasDenoiser(**kw)
    return diffusion, net, params


def test_get_weightings_golden():
    """karras_diffusion.py:18-31 formulas."""
    snrs = jnp.array([0.25, 1.0, 4.0])
    np.testing.assert_allclose(distill.get_weightings("snr", snrs, 0.5), snrs)
    np.testing.assert_allclose(distill.get_weightings("snr+1", snrs, 0.5),
                               snrs + 1)
    np.testing.assert_allclose(distill.get_weightings("karras", snrs, 0.5),
                               snrs + 4.0)
    np.testing.assert_allclose(
        distill.get_weightings("truncated-snr", snrs, 0.5), [1.0, 1.0, 4.0])
    np.testing.assert_allclose(distill.get_weightings("uniform", snrs, 0.5),
                               [1.0, 1.0, 1.0])
    with pytest.raises(NotImplementedError):
        distill.get_weightings("bogus", snrs, 0.5)


def test_training_losses_analytic():
    """With a w=0 net the denoised estimate is c_skip*x_t + c_out*0.01*t;
     'mse' must equal the hand-computed weighted error."""
    diffusion, net, params = _setup(w=0.0, weight_schedule="karras")
    B, R = 4, 8
    x0 = jax.random.normal(jax.random.key(0), (B, R, R, 3))
    noise = jax.random.normal(jax.random.key(1), (B, R, R, 3))
    sig = jnp.array([0.5, 1.0, 2.0, 4.0])

    terms = distill.training_losses(diffusion, net, params, x0, sig,
                                    noise=noise)
    x_t = x0 + noise * sig.reshape(-1, 1, 1, 1)
    c_skip = 0.25 / (sig ** 2 + 0.25)
    c_out = sig * 0.5 / jnp.sqrt(sig ** 2 + 0.25)
    rt = 1000 * 0.25 * jnp.log(sig + 1e-44)
    den = (c_skip.reshape(-1, 1, 1, 1) * x_t
           + c_out.reshape(-1, 1, 1, 1) * (0.01 * rt.reshape(-1, 1, 1, 1)))
    w = sig ** -2 + 4.0
    exp_mse = ((den - x0) ** 2).mean(axis=(1, 2, 3)) * w
    np.testing.assert_allclose(np.asarray(terms["mse"]), np.asarray(exp_mse),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(terms["xs_mse"]),
        np.asarray(((den - x0) ** 2).mean(axis=(1, 2, 3))), rtol=1e-5)


def test_consistency_boundary_target_is_identity():
    """num_scales=2 puts the target at sigma_min, where the boundary
    scalings give c_skip=1, c_out=0 (karras_diffusion.py:70-80): the target
    equals x_t2 itself, so the loss reduces to a computable expression."""
    diffusion, net, params = _setup(distillation=True,
                                    weight_schedule="uniform")
    B, R = 3, 8
    x0 = jax.random.normal(jax.random.key(0), (B, R, R, 3))
    noise = jax.random.normal(jax.random.key(1), (B, R, R, 3))
    out = distill.consistency_losses(diffusion, net, params, params, x0,
                                     num_scales=2, key=jax.random.key(2),
                                     noise=noise)
    # t = sigma_max for every sample; x_t2 via Euler toward x0 at sigma_min
    t, t2 = diffusion.sigma_max, diffusion.sigma_min
    x_t = x0 + noise * t
    x_t2 = x_t + (x_t - x0) / t * (t2 - t)
    cs, co, ci = (np.asarray(v) for v in diffusion.scalings(jnp.array([t])))
    rt = 1000 * 0.25 * np.log(t + 1e-44)
    distiller = co * (ci * np.asarray(x_t) + 0.01 * rt) + cs * np.asarray(x_t)
    exp = ((distiller - np.asarray(x_t2)) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(out["loss"]), exp, rtol=1e-4)


def test_consistency_requires_target():
    diffusion, net, params = _setup()
    x0 = jnp.zeros((2, 8, 8, 3))
    with pytest.raises(ValueError, match="target"):
        distill.consistency_losses(diffusion, net, params, None, x0, 4,
                                   jax.random.key(0))


def test_lpips_gate():
    diffusion, net, params = _setup(distillation=True, loss_norm="lpips")
    x0 = jnp.zeros((2, 8, 8, 3))
    with pytest.raises(ValueError, match="lpips"):
        distill.consistency_losses(diffusion, net, params, params, x0, 4,
                                   jax.random.key(0))


def test_progdist_grad_flows_to_student_only():
    diffusion, net, params = _setup(weight_schedule="snr+1")
    tparams = {"w": jnp.asarray(1.3, jnp.float32)}
    x0 = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))

    def loss_fn(p, tp):
        return distill.progdist_losses(
            diffusion, net, p, x0, 3, jax.random.key(1), teacher_net=net,
            teacher_params=tp)["loss"].mean()

    g_student = jax.grad(loss_fn, argnums=0)(params, tparams)
    g_teacher = jax.grad(loss_fn, argnums=1)(params, tparams)
    assert float(jnp.abs(g_student["w"])) > 0.0
    # solver points are stop-gradiented (karras_diffusion.py:305-310)
    np.testing.assert_allclose(float(g_teacher["w"]), 0.0)


def test_ema_and_scales_fixed():
    fn = distill.create_ema_and_scales_fn("fixed", 0.95, "fixed", 2, 150,
                                          1000)
    assert fn(0) == (0.95, 2) and fn(999) == (0.95, 2)


# ---------------------------------------------------------------------------
# cross-check vs the reference torch implementation
# ---------------------------------------------------------------------------


def _reference_denoiser(reference_path, **kw):
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.RandomCrop = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    sys.path.insert(0, str(reference_path))
    try:
        from models.cm.karras_diffusion import KarrasDenoiser as RefKD
    finally:
        sys.path.pop(0)
    return RefKD(**kw)


def _torch_tiny(w):
    import torch

    class Tiny(torch.nn.Module):
        def __init__(self, w):
            super().__init__()
            self.w = torch.nn.Parameter(torch.tensor(float(w)))

        def forward(self, x, t, **kw):
            return x * self.w + 0.01 * t.view(-1, 1, 1, 1)

    return Tiny(w)


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("loss_norm", ["l2", "l1"])
def test_consistency_losses_vs_reference(reference_path, loss_norm):
    """num_scales=2 makes the reference's internal randint degenerate
    (always 0), so the whole computation is deterministic given the noise."""
    import torch

    B, R = 4, 16
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((B, 3, R, R)).astype(np.float32)
    noise = rng.standard_normal((B, 3, R, R)).astype(np.float32)

    ref = _reference_denoiser(reference_path, weight_schedule="karras",
                              distillation=True, loss_norm=loss_norm)
    m, tgt, tch = _torch_tiny(1.0), _torch_tiny(0.7), _torch_tiny(1.3)
    ref_out = ref.consistency_losses(
        m, torch.from_numpy(x0), 2, target_model=tgt, teacher_model=tch,
        teacher_diffusion=ref, noise=torch.from_numpy(noise))
    ref_loss = ref_out["loss"].detach().numpy()

    diffusion, net, _ = _setup(distillation=True, weight_schedule="karras",
                               loss_norm=loss_norm)
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    out = distill.consistency_losses(
        diffusion, net, {"w": jnp.float32(1.0)}, {"w": jnp.float32(0.7)},
        nhwc(x0), 2, jax.random.key(0), teacher_net=net,
        teacher_params={"w": jnp.float32(1.3)}, teacher_diffusion=diffusion,
        noise=nhwc(noise))
    np.testing.assert_allclose(np.asarray(out["loss"]), ref_loss, rtol=2e-4,
                               atol=1e-5)


@requires_reference
@pytest.mark.slow
def test_progdist_and_training_losses_vs_reference(reference_path):
    """progdist with num_scales=1 (degenerate randint) + DSM at fixed
    sigmas vs the reference formulas."""
    import torch

    B, R = 4, 16
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((B, 3, R, R)).astype(np.float32)
    noise = rng.standard_normal((B, 3, R, R)).astype(np.float32)
    sig = np.array([0.5, 1.0, 2.0, 40.0], np.float32)

    ref = _reference_denoiser(reference_path, weight_schedule="karras")
    m, tch = _torch_tiny(1.0), _torch_tiny(1.3)
    ref_pd = ref.progdist_losses(
        m, torch.from_numpy(x0), 1, teacher_model=tch, teacher_diffusion=ref,
        noise=torch.from_numpy(noise))["loss"].detach().numpy()
    ref_tl = ref.training_losses(
        m, torch.from_numpy(x0), torch.from_numpy(sig),
        noise=torch.from_numpy(noise))

    diffusion, net, params = _setup(weight_schedule="karras")
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    pd = distill.progdist_losses(
        diffusion, net, params, nhwc(x0), 1, jax.random.key(0),
        teacher_net=net, teacher_params={"w": jnp.float32(1.3)},
        teacher_diffusion=diffusion, noise=nhwc(noise))
    np.testing.assert_allclose(np.asarray(pd["loss"]), ref_pd, rtol=2e-4,
                               atol=1e-5)

    tl = distill.training_losses(diffusion, net, params, nhwc(x0),
                                 jnp.asarray(sig), noise=nhwc(noise))
    for k in ("xs_mse", "mse", "loss"):
        np.testing.assert_allclose(np.asarray(tl[k]),
                                   ref_tl[k].detach().numpy(), rtol=2e-4,
                                   atol=1e-5)


@requires_reference
@pytest.mark.slow
def test_ema_and_scales_vs_reference(reference_path):
    """All four mode pairs across the step range (script_util.py:161-219)."""
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.RandomCrop = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    sys.path.insert(0, str(reference_path))
    try:
        from models.cm.script_util import create_ema_and_scales_fn as ref_fn
    finally:
        sys.path.pop(0)

    cases = [
        dict(target_ema_mode="fixed", start_ema=0.95, scale_mode="fixed",
             start_scales=40, end_scales=40, total_steps=1000,
             distill_steps_per_iter=0),
        dict(target_ema_mode="fixed", start_ema=0.95,
             scale_mode="progressive", start_scales=2, end_scales=150,
             total_steps=1000, distill_steps_per_iter=0),
        dict(target_ema_mode="adaptive", start_ema=0.95,
             scale_mode="progressive", start_scales=2, end_scales=150,
             total_steps=1000, distill_steps_per_iter=0),
        dict(target_ema_mode="fixed", start_ema=0.95, scale_mode="progdist",
             start_scales=16, end_scales=1, total_steps=1000,
             distill_steps_per_iter=50),
    ]
    for kw in cases:
        ours, ref = distill.create_ema_and_scales_fn(**kw), ref_fn(**kw)
        for step in range(0, 1000, 7):
            o, r = ours(step), ref(step)
            assert o[1] == r[1], (kw["scale_mode"], step, o, r)
            np.testing.assert_allclose(o[0], r[0], rtol=1e-12,
                                       err_msg=str((kw, step)))
