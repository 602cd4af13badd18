"""End-to-end real-weight parity against a committed golden torch run dir.

``tests/fixtures/torch_rundir_t10/`` was produced by
``scripts/make_torch_fixture.py``: the REFERENCE trainer
(/root/reference/models/DxMI/trainer.py) genuinely trained for 3,000 CPU
steps (T=10 VARSampler + unet_small + IGEBM value) on structured
synthetic data, then saved the reference run-dir contract
(config.yaml + sampler_best.pth + value_best.pth,
/root/reference/train_cifar10.py:57-79) plus a deterministic trajectory
replay (``golden.npz``: fixed x0 + per-step eps, per-step mean/sigma,
final sample, value outputs, trained log_betas).

These tests validate the operational chain the reference's users rely
on — published torch run dir -> config load (reference ``_target_``
paths) -> checkpoint resolve -> torch->flax conversion -> sampling —
on TRAINED weights, where GroupNorm/attention statistics differ
materially from the random-init parity tests (VERDICT.md round-1 #4).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu import config as cfglib
from dxmi_tpu.config import instantiate
from dxmi_tpu.utils import checkpoint as ckptlib
from dxmi_tpu.utils import convert

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "torch_rundir_t10")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="golden fixture not committed")


@pytest.fixture(scope="module")
def rundir():
    cfg = cfglib.load_yaml(os.path.join(FIXTURE, "config.yaml"))
    golden = np.load(os.path.join(FIXTURE, "golden.npz"))
    return cfg, golden


@pytest.fixture(scope="module")
def sampler_and_params(rundir):
    cfg, _ = rundir
    net = instantiate(cfg["sampler_net"])
    sampler = instantiate(cfg["sampler"], net=net)
    ckpt, path = ckptlib.load_run_checkpoint(FIXTURE, "sampler", "best",
                                             torch_kind="unet_small")
    assert path.endswith("sampler_best.pth")
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    return sampler, params


def test_config_loads_reference_targets(rundir):
    cfg, _ = rundir
    # the fixture config uses the reference's _target_ paths verbatim
    assert cfg["sampler_net"]["_target_"] == "models.DxMI.unet_small.Model"
    net = instantiate(cfg["sampler_net"])
    assert type(net).__name__ == "UNetSmall"


def test_log_betas_roundtrip(rundir, sampler_and_params):
    _, golden = rundir
    _, params = sampler_and_params
    np.testing.assert_allclose(np.asarray(params["log_betas"]),
                               golden["log_betas"], rtol=0, atol=1e-6)


def test_trained_weight_trajectory_parity(rundir, sampler_and_params):
    """Replay the golden trajectory: same x0, same per-step eps; compare
    per-step mean/sigma and the final sample on TRAINED weights."""
    cfg, golden = rundir
    sampler, params = sampler_and_params
    T = int(cfg["sampler"]["n_timesteps"])

    x = jnp.asarray(golden["x0"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    eps = golden["eps"].transpose(0, 1, 3, 4, 2)
    B = x.shape[0]
    key = jax.random.key(0)  # unused: we inject the torch eps directly

    step = jax.jit(lambda p, x, t: sampler.sample_step(
        p, x, jnp.full((B,), t, jnp.int32), key))
    max_mean_err = 0.0
    for t in range(T):
        out = step(params, x, t)
        mean = np.asarray(out["mean"])
        ref_mean = golden["means"][t].transpose(0, 2, 3, 1)
        err = np.max(np.abs(mean - ref_mean))
        max_mean_err = max(max_mean_err, err)
        # trained-weight forward + conversion agreement, accumulated
        # over t steps of drift
        assert err < 5e-4, f"step {t}: mean drift {err:.2e}"
        sigma = np.asarray(out["sigma"]).reshape(B, 1, 1, 1)
        np.testing.assert_allclose(
            sigma, golden["sigmas"][t], rtol=1e-5, atol=1e-7,
            err_msg=f"step {t} sigma")
        x = jnp.asarray(ref_mean + golden["sigmas"][t] * eps[t])

    final = np.asarray(x)
    np.testing.assert_allclose(final, golden["final"].transpose(0, 2, 3, 1),
                               rtol=0, atol=5e-4)


def test_trained_value_parity(rundir):
    cfg, golden = rundir
    v = instantiate(cfg["value"])
    state = ckptlib.load_torch_checkpoint(
        os.path.join(FIXTURE, "value_best.pth"))
    state.pop("__meta__", None)
    variables = convert.wrap_value_params(convert.convert_igebm(state))
    x = jnp.asarray(golden["final"].transpose(0, 2, 3, 1))
    B = x.shape[0]
    out = v.apply(variables, x, jnp.full((B,), 9, jnp.int32))
    np.testing.assert_allclose(np.asarray(out).reshape(-1),
                               golden["v_out"].reshape(-1),
                               rtol=1e-4, atol=1e-4)
