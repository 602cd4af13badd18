"""Trained-ADM golden fixture: run-dir load + conversion + EDMSampler
trajectory parity on TRAINED weights (VERDICT r3 Missing #1 / task 2).

``tests/fixtures/torch_rundir_adm_t10/`` was produced by
``scripts/make_torch_adm_fixture.py``: the REFERENCE stack (cm UNetModel
via create_model_and_diffusion, OpenAIDiffusion, DxMI_Trainer_Cond,
MixedPrecisionTrainer — /root/reference/train_image_large.py:130-269)
genuinely EDM-pretrained then DxMI-fine-tuned a tiny class-conditional
ADM net on synthetic 4-class data, saved the reference run-dir contract
(config.yaml + sampler.pth {'state_dict','fid','i_iter'} + value.pth),
and recorded a deterministic trajectory replay (``golden.npz``).

This mirrors tests/test_golden_fixture.py for the large-image family:
the CIFAR path's round-1..3 lesson was that trained weights behave
materially differently from random init (GN/attention statistics, pixel
drift 4.5% random -> 0.52% trained), so conversion + sampling parity and
the ``generate_large`` default-path drift gates must run on a trained
artifact.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu import config as cfglib
from dxmi_tpu.config import instantiate
from dxmi_tpu.models.unet_adm import create_unet_adm
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.utils import checkpoint as ckptlib
from dxmi_tpu.utils import convert

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "torch_rundir_adm_t10")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="ADM golden fixture not committed")


@pytest.fixture(scope="module")
def rundir():
    cfg = cfglib.load_yaml(os.path.join(FIXTURE, "config.yaml"))
    golden = np.load(os.path.join(FIXTURE, "golden.npz"))
    return cfg, golden


@pytest.fixture(scope="module")
def sampler_and_params(rundir):
    cfg, _ = rundir
    dcfg = dict(cfg["diffusion"])
    sigma_min = dcfg.pop("sigma_min")
    sigma_max = dcfg.pop("sigma_max")
    dcfg.pop("weight_schedule", None)
    distillation = dcfg.pop("distillation", False)
    net = create_unet_adm(**dcfg)
    denoiser = KarrasDenoiser(sigma_min=sigma_min, sigma_max=sigma_max,
                              distillation=distillation)
    sampler = EDMSampler(net, denoiser, **cfg["sampler"])
    ckpt, path = ckptlib.load_run_checkpoint(FIXTURE, "sampler", "last",
                                             torch_kind="unet_adm")
    assert path.endswith("sampler.pth")
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    return sampler, params


def test_config_loads_and_checkpoint_meta(rundir, sampler_and_params):
    cfg, _ = rundir
    assert cfg["trainer"]["_target_"] == "models.DxMI.trainer.DxMI_Trainer_Cond"
    trainer = instantiate(cfg["trainer"], batchsize=4)
    assert type(trainer).__name__ == "DxMITrainerCond"
    sampler, params = sampler_and_params
    assert sampler.class_cond and sampler.num_classes == 4
    assert "log_betas" in params


def test_log_betas_roundtrip(rundir, sampler_and_params):
    _, golden = rundir
    _, params = sampler_and_params
    np.testing.assert_allclose(np.asarray(params["log_betas"]),
                               golden["log_betas"], rtol=0, atol=1e-6)


def test_sigma_grid_matches_reference(rundir, sampler_and_params):
    """The Karras grid the reference OpenAIDiffusion computed
    (openai_diffusion.py:29-37) vs our KarrasSchedule."""
    _, golden = rundir
    sampler, _ = sampler_and_params
    grid = golden["sigmas_grid"]
    # torch's get_sigmas_karras appends the terminal 0 (length T+1) and
    # computes the ramp in a dtype chain that differs from ours at the
    # ~2e-7 rel level; our .sigmas property holds the T live steps
    assert grid[-1] == 0.0
    np.testing.assert_allclose(np.asarray(sampler.sigmas), grid[:-1],
                               rtol=1e-5, atol=1e-6)


def test_trained_weight_trajectory_parity(rundir, sampler_and_params):
    """Replay the golden trajectory: same x_init/labels, same per-step
    eps; compare per-step mean/sigma and the final sample on TRAINED
    ADM weights through the full conversion + EDMSampler chain."""
    cfg, golden = rundir
    sampler, params = sampler_and_params
    T = int(cfg["sampler"]["n_timesteps"])

    x = jnp.asarray(golden["x_init"].transpose(0, 2, 3, 1))
    y = jnp.asarray(golden["y"], jnp.int32)
    eps = golden["eps"].transpose(0, 1, 3, 4, 2)
    B = x.shape[0]
    key = jax.random.key(0)  # unused: the torch eps is injected directly

    step = jax.jit(lambda p, x, t: sampler.sample_step(
        p, x, jnp.full((B,), t, jnp.int32), key, y=y))
    for t in range(T):
        out = step(params, x, t)
        mean = np.asarray(out["mean"])
        ref_mean = golden["means"][t].transpose(0, 2, 3, 1)
        err = np.max(np.abs(mean - ref_mean))
        # fp32 CPU forward of a trained 0.8M-param ADM net; the sigma_max
        # 80 input scale makes early-step abs errors larger than CIFAR's
        assert err < 5e-3, f"step {t}: mean drift {err:.2e}"
        sigma = np.asarray(out["sigma"]).reshape(B, 1, 1, 1)
        np.testing.assert_allclose(
            sigma, golden["sigmas"][t], rtol=1e-5, atol=1e-6,
            err_msg=f"step {t} sigma")
        x = jnp.asarray(ref_mean + golden["sigmas"][t] * eps[t])

    final = np.asarray(x)
    np.testing.assert_allclose(final, golden["final"].transpose(0, 2, 3, 1),
                               rtol=0, atol=5e-3)


def test_trained_value_parity(rundir):
    cfg, golden = rundir
    v = instantiate(cfg["value"])
    state = ckptlib.load_torch_checkpoint(os.path.join(FIXTURE, "value.pth"))
    state.pop("__meta__", None)
    variables = convert.wrap_value_params(convert.convert_igebm(state))
    x = jnp.asarray(golden["final"].transpose(0, 2, 3, 1))
    B = x.shape[0]
    T = int(cfg["sampler"]["n_timesteps"])
    out = v.apply(variables, x, jnp.full((B,), T, jnp.int32))
    np.testing.assert_allclose(np.asarray(out).reshape(-1),
                               golden["v_out"].reshape(-1),
                               rtol=1e-4, atol=1e-4)
