"""Spectral-norm 'sn_stats' threading through the jitted trainers.

The reference's IGEBMEncoderV2 spectral_norm option (modules.py:34-47,
torch spectral_norm) runs a power iteration on every train-mode forward.
Here the u/sigma vectors live in a flax 'sn_stats' collection carried in
DxMIState.v_stats / f_stats and advance once per value-training forward
inside the jitted update programs.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buf
from dxmi_tpu.trainers.dxmi import DxMITrainer
from dxmi_tpu.trainers.dxmi_ev import DxMITrainerEV


class TinyEps(nn.Module):
    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        h = jax.nn.silu(h + t[:, None, None, None] * 0.01)
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(h)


T = 4
B = 8
RES = 8


def _stats_leaf(stats):
    # largest leaf = a power-iteration u vector (sigma leaves are scalars)
    return np.asarray(max(jax.tree.leaves(stats), key=lambda a: a.size))


@pytest.fixture(scope="module")
def sn_setup():
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(
        nh=8, keepdim=False, learn_out_scale=True, use_spectral_norm=True))
    trainer = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                          n_timesteps=T, use_sampler_beta=True)
    trainer.set_models(sampler, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    x = jnp.zeros((1, RES, RES, 3))
    variables = value.init(jax.random.key(1), x, jnp.zeros((1,), jnp.int32))
    assert "sn_stats" in variables, "spectral-norm net must carry sn_stats"
    state = trainer.init_state(sp, variables["params"],
                               v_stats=variables["sn_stats"])
    return trainer, sampler, state


def test_sn_stats_advance_in_update_f_v(sn_setup):
    trainer, sampler, state = sn_setup
    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    b = buf.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    u0 = _stats_leaf(state.v_stats)
    state2, m = trainer.update_f_v(state, img, b, jax.random.key(5))
    assert np.isfinite(float(m["ebm/d_loss_"]))
    assert np.isfinite(float(m["ebm/v_loss_"]))
    u1 = _stats_leaf(state2.v_stats)
    assert u0.shape == u1.shape
    assert not np.array_equal(u0, u1), "power iteration did not advance"

    # a second tick advances them again (carried through the scan)
    state3, _ = trainer.update_f_v(state2, img, b, jax.random.key(6))
    assert not np.array_equal(_stats_leaf(state3.v_stats), u1)


def test_sn_update_sampler_and_guidance(sn_setup):
    trainer, sampler, state = sn_setup
    d = sampler.sample(state.sampler_params, jax.random.key(7), B)
    b = buf.from_d_sample(d)
    state2, m = trainer.update_sampler(state, b, jax.random.key(8),
                                       n_generator=1)
    assert np.isfinite(float(m["sampler/sampler_loss_"]))
    # policy update uses fixed stats
    np.testing.assert_array_equal(_stats_leaf(state2.v_stats),
                                  _stats_leaf(state.v_stats))

    out = trainer.sample_guidance(state, jax.random.key(9), n_sample=4,
                                  guidance_scale=0.1)
    assert np.isfinite(np.asarray(out["sample"])).all()


def test_sn_ev_trainer_tick():
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False,
                                                  use_spectral_norm=True))
    energy = IGEBMEncoder(nh=8, keepdim=False, use_spectral_norm=True)
    trainer = DxMITrainerEV(batchsize=B, tau1=0.1, tau2=0.01, n_timesteps=T,
                            use_sampler_beta=True)
    trainer.set_models(sampler, value, energy, lr=1e-4, v_lr=1e-4, f_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    x = jnp.zeros((1, RES, RES, 3))
    vv = value.init(jax.random.key(1), x, jnp.zeros((1,), jnp.int32))
    fv = energy.init(jax.random.key(2), x)
    state = trainer.init_state_ev(sp, vv["params"], fv["params"],
                                  v_stats=vv["sn_stats"],
                                  f_stats=fv["sn_stats"])

    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    b = buf.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    u_v0, u_f0 = _stats_leaf(state.v_stats), _stats_leaf(state.f_stats)
    state2, m = trainer.update_f_v(state, img, b, jax.random.key(5))
    assert np.isfinite(float(m["ebm/d_loss_"]))
    assert not np.array_equal(_stats_leaf(state2.v_stats), u_v0)
    assert not np.array_equal(_stats_leaf(state2.f_stats), u_f0)

    state3, m2 = trainer.update_sampler(state2, b, jax.random.key(6),
                                        n_generator=1)
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))
