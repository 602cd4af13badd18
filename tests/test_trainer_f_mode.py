"""Base-trainer optional separate-energy (f) mode tests."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi import DxMITrainer


class TinyEps(nn.Module):
    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(jax.nn.silu(h))


def test_f_mode_tick():
    T, B, RES = 4, 4, 8
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    energy = IGEBMEncoder(nh=8, keepdim=False)
    tr = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                     n_timesteps=T, use_sampler_beta=True, time_cost=0.0)
    tr.set_models(sampler, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4,
                  energy=energy, f_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    x0 = jnp.zeros((1, RES, RES, 3))
    vp = value.init(jax.random.key(1), x0, jnp.zeros((1,), jnp.int32))["params"]
    fp = energy.init(jax.random.key(2), x0)["params"]
    state = tr.init_state(sp, vp, f_params=fp)

    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    f_before = np.asarray(jax.tree.leaves(state.f_params)[0]).copy()
    v_before = np.asarray(jax.tree.leaves(state.v_params)[0]).copy()
    state, m1 = tr.update_f_v(state, img, traj, jax.random.key(5))
    # the contrastive step trains f, NOT v; the TD sweep then trains v
    assert not np.allclose(np.asarray(jax.tree.leaves(state.f_params)[0]),
                           f_before)
    assert not np.allclose(np.asarray(jax.tree.leaves(state.v_params)[0]),
                           v_before)
    assert np.isfinite(float(m1["ebm/d_loss_"]))

    state, m2 = tr.update_sampler(state, traj, jax.random.key(6),
                                  n_generator=1)
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))
