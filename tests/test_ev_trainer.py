"""DxMITrainerEV (separate energy + value) tick test + anomaly metrics."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi_ev import DxMITrainerEV


class TinyEps(nn.Module):
    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(jax.nn.silu(h))


def test_ev_trainer_tick():
    T, B, RES = 4, 4, 8
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta=True)
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    energy = IGEBMEncoder(nh=8, keepdim=False)
    tr = DxMITrainerEV(batchsize=B, tau1=0.1, tau2=0.01, n_timesteps=T,
                       use_sampler_beta=True, adavelreg=0.99)
    tr.set_models(sampler, value, energy, lr=1e-4, v_lr=1e-4, f_lr=1e-4,
                  beta_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    x0 = jnp.zeros((1, RES, RES, 3))
    vp = value.init(jax.random.key(1), x0, jnp.zeros((1,), jnp.int32))["params"]
    fp = energy.init(jax.random.key(2), x0)["params"]
    state = tr.init_state_ev(sp, vp, fp)

    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    f_before = np.asarray(jax.tree.leaves(state.f_params)[0]).copy()
    state, m1 = tr.update_f_v(state, img, traj, jax.random.key(5))
    assert np.isfinite(float(m1["ebm/d_loss_"]))
    # energy params moved
    assert not np.allclose(np.asarray(jax.tree.leaves(state.f_params)[0]),
                           f_before)

    state, m2 = tr.update_sampler(state, traj, jax.random.key(6), n_generator=1)
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))
    assert m2["per_step/sigma"].shape == (T,)


def test_ev_betas_from_live_log_betas():
    """use_sampler_beta EV betas_for_q tracks the CURRENT sampler params'
    exp(log_betas) (trainer.py:909-911) — not the init schedule — so
    checkpoints whose log_betas were trained away are honored."""
    T, B, RES = 4, 4, 8
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta=True)
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    energy = IGEBMEncoder(nh=8, keepdim=False)
    tr = DxMITrainerEV(batchsize=B, tau1=0.1, tau2=0.01, n_timesteps=T,
                       use_sampler_beta=True)
    tr.set_models(sampler, value, energy, lr=1e-4, v_lr=1e-4, f_lr=1e-4,
                  beta_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    sp = dict(sp, log_betas=sp["log_betas"] - 0.7)  # "trained" betas
    x0 = jnp.zeros((1, RES, RES, 3))
    vp = value.init(jax.random.key(1), x0, jnp.zeros((1,), jnp.int32))["params"]
    fp = energy.init(jax.random.key(2), x0)["params"]
    state = tr.init_state_ev(sp, vp, fp)
    np.testing.assert_allclose(np.asarray(state.betas_for_q),
                               np.exp(np.asarray(sp["log_betas"])), rtol=1e-6)


def test_energy_anomaly_scores():
    from dxmi_tpu.utils.metrics import anomaly_scores_from_energy

    rng = np.random.RandomState(0)
    e_in = rng.randn(200)
    e_out = rng.randn(200) + 3.0  # OOD has higher energy
    d = anomaly_scores_from_energy(e_in, e_out)
    assert d["auroc"] > 0.95
    assert d["aupr"] > 0.95


def test_native_io_roundtrip(tmp_path):
    from dxmi_tpu.utils import native_io

    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    native_io.write_png(p, img)  # native or PIL fallback
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)
    if native_io.available():
        p2 = str(tmp_path / "y.png")
        assert native_io.write_png_async(p2, img)
        assert native_io.flush() == 0
        np.testing.assert_array_equal(np.asarray(Image.open(p2)), img)
