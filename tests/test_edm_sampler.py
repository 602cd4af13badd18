"""EDM sampler tests: analytic single-step math, fix_last masks, class
conditioning plumbing, Cond trainer tick, and a torch cross-check of the
denoiser preconditioning."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser, karras_sample
from tests.conftest import requires_reference


class ConstNet(nn.Module):
    """Stub ADM net returning a learnable constant (ignores conditioning)."""

    @nn.compact
    def __call__(self, x, t, y=None, *, deterministic=True):
        c = self.param("c", lambda k, s: jnp.full(s, 0.1), (1,))
        return jnp.ones_like(x) * c


@pytest.fixture(scope="module")
def sampler():
    return EDMSampler(ConstNet(), None, n_timesteps=4, sample_shape=(3, 8, 8),
                      class_cond=True, num_classes=10,
                      trainable_beta="fix_last", stochastic_last=True, rho=4.0)


@pytest.fixture(scope="module")
def params(sampler):
    return sampler.init_params(jax.random.key(0))


def test_log_betas_init_clamped(sampler, params):
    ref = np.log(np.clip(np.asarray(sampler.schedule.sigma_up), 1e-3, None))
    np.testing.assert_allclose(np.asarray(params["log_betas"]), ref, rtol=1e-6)


def test_sample_step_analytic(sampler, params):
    """One Euler-ancestral step must match the closed form with the stub
    denoiser: denoised = c_out * 0.1 + c_skip * x."""
    from dxmi_tpu.schedules import edm_scalings

    sch = sampler.schedule
    B = 2
    x = jax.random.normal(jax.random.key(1), (B, 8, 8, 3)) * 10
    t = jnp.array([0, 2])
    d = sampler.sample_step(params, x, t, jax.random.key(2),
                            y=jnp.array([1, 2]))

    sigma = np.take(np.asarray(sch.sigmas), np.asarray(t))[:, None, None, None]
    c_skip, c_out, c_in = (np.asarray(s) for s in edm_scalings(
        jnp.asarray(sigma.ravel())))
    denoised = (c_out[:, None, None, None] * 0.1
                + c_skip[:, None, None, None] * np.asarray(x))
    dd = (np.asarray(x) - denoised) / sigma
    down = np.take(np.asarray(sch.sigma_down), np.asarray(t))[:, None, None, None]
    mu = np.asarray(x) + dd * (down - sigma)
    np.testing.assert_allclose(np.asarray(d["mean"]), mu, rtol=1e-4, atol=1e-5)

    sig_up = np.exp(np.asarray(params["log_betas"]))[np.asarray(t)]
    np.testing.assert_allclose(np.asarray(d["sigma"]),
                               np.clip(sig_up, 1e-4, None), rtol=1e-5)


def test_fix_last_mask(sampler, params):
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.array([3, 3])  # terminal
    d = sampler.sample_step(params, x, t, jax.random.key(0), y=jnp.array([0, 0]))
    # terminal sigma pinned to the analytic sigma_up (clamped to 1e-4 floor)
    expect = max(float(sampler.schedule.sigma_up[-1]), 1e-4)
    np.testing.assert_allclose(np.asarray(d["sigma"]), expect, rtol=1e-5)


def test_fix_last3():
    s = EDMSampler(ConstNet(), None, n_timesteps=6, sample_shape=(3, 8, 8),
                   trainable_beta="fix_last3")
    p = s.init_params(jax.random.key(0))
    p = dict(p, log_betas=p["log_betas"] + 1.0)  # perturb learned sigmas
    sig = np.asarray(s.sigmas_up_all(p))
    sch = np.asarray(s.schedule.sigma_up)
    np.testing.assert_allclose(sig[3:], sch[3:], rtol=1e-6)  # last 3 pinned
    assert np.all(sig[:3] > sch[:3])  # first 3 learned (+1 in log space)


def test_sample_contract_and_classes(sampler, params):
    d = sampler.sample(params, jax.random.key(3), n_sample=4)
    assert d["sample"].shape == (4, 8, 8, 3)
    assert d["l_sample"].shape == (5, 4, 8, 8, 3)
    assert d["y"].shape == (4,)
    assert d["y"].dtype == jnp.int32
    # x_T scaled by sigma_max
    x_t = np.asarray(d["l_sample"][0])
    assert 20 < x_t.std() < 200  # sigma_max = 80

    d2 = sampler.sample(params, jax.random.key(3), n_sample=4, i_class=7)
    np.testing.assert_array_equal(np.asarray(d2["y"]), 7)


def test_karras_sample_smoke():
    diff = KarrasDenoiser()
    net = ConstNet()
    p = net.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                 jnp.zeros((1,)))["params"]
    for s in ("heun", "euler", "ancestral", "onestep", "dpm", "multistep",
              "progdist"):
        out = karras_sample(diff, net, p, jax.random.key(1), (2, 8, 8, 3),
                            steps=4, sampler=s)
        assert out.shape == (2, 8, 8, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)

    # stochastic churn (s_churn > 0) perturbs the deterministic solvers
    for s in ("heun", "euler", "dpm"):
        base = karras_sample(diff, net, p, jax.random.key(1), (2, 8, 8, 3),
                             steps=4, sampler=s)
        churn = karras_sample(diff, net, p, jax.random.key(1), (2, 8, 8, 3),
                              steps=4, sampler=s, s_churn=2.0)
        assert churn.shape == base.shape
        assert np.all(np.isfinite(np.asarray(churn)))
        assert not np.allclose(np.asarray(churn), np.asarray(base))


def test_cond_trainer_tick():
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    T, B, RES = 4, 4, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T, sample_shape=(3, RES, RES),
                   class_cond=True, num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True, adavelreg=0.99,
                         value_grad_clip=True, time_cost=0.0, time_cost_sig=1.0,
                         skip_sampler_tau=3)
    tr.set_models(s, value, lr=1e-5, v_lr=1e-4, beta_lr=1e-5)
    assert tr.beta_ordering == "forward"
    assert tr.sampler_grad_clip is None and tr.nan_guard

    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)
    # betas_for_q from the EDM sigma grid (trainer.py:516-517)
    np.testing.assert_allclose(np.asarray(state.betas_for_q),
                               np.asarray(s.schedule.sigmas) ** 2, rtol=1e-6)

    d = s.sample(state.sampler_params, jax.random.key(2), B)
    traj = buflib.from_d_sample(d)
    assert traj.y is not None
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))
    y = jnp.zeros((B,), jnp.int32)
    state, m1 = tr.update_f_v(state, img, traj, jax.random.key(4), y=y)
    state, m2 = tr.update_sampler(state, traj, jax.random.key(5))
    assert np.isfinite(float(m1["ebm/d_loss_"]))
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))


def test_cond_fused_train_step_with_labels():
    """train_step(y=labels) must thread class labels through the chunked
    trajectory sampling (regression: sample() takes i_class, not y)."""
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    T, B, RES = 4, 4, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T, sample_shape=(3, RES, RES),
                   class_cond=True, num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True, adavelreg=0.99,
                         time_cost=0.0, time_cost_sig=1.0)
    tr.set_models(s, value, lr=1e-5, v_lr=1e-4, beta_lr=1e-5)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)
    img = jax.random.normal(jax.random.key(2), (B, RES, RES, 3))
    y = jnp.arange(B, dtype=jnp.int32) % 10
    state, m = tr.train_step(state, img, jax.random.key(3), y=y)
    assert np.isfinite(float(m["ebm/d_loss_"]))
    assert np.isfinite(float(m["sampler/sampler_loss_"]))


def test_cond_value_resample_threads_labels():
    """value_resample=True with a class-conditional sampler must pass the
    trajectory's labels to the re-run policy step (the reference omits y
    at trainer.py:612 and would assert inside a conditional UNet)."""
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    class YRequiredNet(nn.Module):
        """Stub that hard-requires class labels like UNetADM
        (unet_adm.py class_cond assert)."""

        @nn.compact
        def __call__(self, x, t, y=None, *, deterministic=True):
            assert y is not None, "class-conditional model needs y"
            c = self.param("c", lambda k, s: jnp.full(s, 0.1), (1,))
            emb = self.param("emb", nn.initializers.zeros, (10,))
            return jnp.ones_like(x) * c + jnp.take(emb, y).reshape(-1, 1, 1, 1)

    T, B, RES = 4, 4, 8
    s = EDMSampler(YRequiredNet(), None, n_timesteps=T,
                   sample_shape=(3, RES, RES), class_cond=True,
                   num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True, adavelreg=0.99,
                         time_cost=0.0, time_cost_sig=1.0, value_resample=True)
    tr.set_models(s, value, lr=1e-5, v_lr=1e-4, beta_lr=1e-5)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)
    d = s.sample(state.sampler_params, jax.random.key(2), B)
    traj = buflib.from_d_sample(d)
    assert traj.y is not None
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))
    y = jnp.arange(B, dtype=jnp.int32) % 10
    state, m = tr.update_f_v(state, img, traj, jax.random.key(4), y=y)
    assert np.isfinite(float(m["ebm/d_loss_"]))


def test_cond_shuffle_update_order():
    """value_update_order='shuffle' (trainer.py:602-608): sweep steps
    consume minibatches of a global row permutation (mixed timesteps)."""
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    T, B, RES = 4, 4, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T, sample_shape=(3, RES, RES),
                   class_cond=True, num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True, adavelreg=0.99,
                         time_cost=0.0, time_cost_sig=1.0,
                         value_update_order="shuffle", repeat_value_update=2)
    tr.set_models(s, value, lr=1e-5, v_lr=1e-4, beta_lr=1e-5)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)
    d = s.sample(state.sampler_params, jax.random.key(2), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))
    state, m = tr.update_f_v(state, img, traj, jax.random.key(4),
                             y=jnp.zeros((B,), jnp.int32))
    assert np.isfinite(float(m["ebm/d_loss_"]))
    # metric labels keep the reference's backward update_t keying
    np.testing.assert_array_equal(np.asarray(m["per_step/t"]),
                                  np.arange(T - 1, -1, -1))


def test_cond_sample_guidance():
    """Cond value-guided sampling (trainer.py:811-860): sigma_max-scaled
    prior, class labels threaded through sample_step, guidance masked by
    t_select."""
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    T, B, RES = 4, 6, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T, sample_shape=(3, RES, RES),
                   class_cond=True, num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True, adavelreg=0.99,
                         time_cost=0.0, time_cost_sig=1.0)
    tr.set_models(s, value, lr=1e-5, v_lr=1e-4, beta_lr=1e-5)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)

    d = tr.sample_guidance(state, jax.random.key(2), B, guidance_scale=0.1)
    assert d["sample"].shape == (B, RES, RES, 3)
    assert d["l_sample"].shape == (T + 1, B, RES, RES, 3)
    assert np.all(np.isfinite(np.asarray(d["sample"])))
    # class labels drawn and in range (reference threads y into each step)
    y = np.asarray(d["y"])
    assert y.shape == (B,) and y.min() >= 0 and y.max() < 10
    # prior is sigma_max-scaled (x_T ~ N(0,I) * 80), not unit normal
    x0_std = float(np.asarray(d["l_sample"][0]).std())
    assert 60.0 < x0_std < 100.0

    # guidance_scale=0 zeroes the guidance term
    d0 = tr.sample_guidance(state, jax.random.key(2), B, guidance_scale=0.0)
    np.testing.assert_allclose(np.asarray(d0["guidance"]), 0.0)

    # t_select masks guidance to the selected steps only
    dsel = tr.sample_guidance(state, jax.random.key(2), B,
                              guidance_scale=0.1, t_select=(T - 1,))
    g = np.asarray(dsel["guidance"])
    # guidance is recorded for every step but only applied at t_select;
    # applied steps must differ from the unguided trajectory
    assert not np.allclose(np.asarray(dsel["sample"]),
                           np.asarray(d0["sample"]))
    assert g.shape[0] == T

    # pinned class label
    dpin = tr.sample_guidance(state, jax.random.key(3), B,
                              guidance_scale=0.1, i_class=7)
    assert np.all(np.asarray(dpin["y"]) == 7)


@pytest.mark.slow
@requires_reference
def test_denoiser_preconditioning_vs_reference(reference_path):
    """EDM c_skip/c_out/c_in + rescaled_t vs the reference KarrasDenoiser
    formulas (karras_diffusion.py:63-67, 336-351) via torch."""
    import torch

    from dxmi_tpu.schedules import edm_rescaled_t, edm_scalings

    sigma = np.array([80.0, 5.1, 0.3, 0.002], dtype=np.float32)
    sd = 0.5
    c_skip_ref = sd**2 / (sigma**2 + sd**2)
    c_out_ref = sigma * sd / np.sqrt(sigma**2 + sd**2)
    c_in_ref = 1 / np.sqrt(sigma**2 + sd**2)
    rescaled_ref = 1000 * 0.25 * torch.log(torch.from_numpy(sigma) + 1e-44)

    cs, co, ci = edm_scalings(jnp.asarray(sigma), sd)
    np.testing.assert_allclose(np.asarray(cs), c_skip_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(co), c_out_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ci), c_in_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(edm_rescaled_t(jnp.asarray(sigma))),
                               rescaled_ref.numpy(), rtol=1e-5)


def test_td_sweep_order_invariance_frozen_value():
    """With v_lr=0 the value params never change across the sweep, so the
    mean over sweep steps of v_loss / running_cost / value equals the
    global mean over the T*B rows — identical between 'backward' and
    'shuffle' orders (each covers the newest T*B rows exactly once,
    trainer.py:589-608)."""
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

    T, B, RES = 4, 4, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T, sample_shape=(3, RES, RES),
                   class_cond=False, trainable_beta="fix_last")
    sp = s.init_params(jax.random.key(0))
    d = s.sample(sp, jax.random.key(2), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))

    def run(order):
        value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
        tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                             n_timesteps=T, use_sampler_beta=True,
                             adavelreg=0.99, time_cost=0.0, time_cost_sig=1.0,
                             value_update_order=order)
        tr.set_models(s, value, lr=1e-5, v_lr=0.0, beta_lr=1e-5)
        vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
        state = tr.init_state(sp, vp)
        _, m = tr.update_f_v(state, img, traj, jax.random.key(4))
        return m

    mb, ms = run("backward"), run("shuffle")
    for key in ("per_step/v_loss", "per_step/running_cost", "per_step/value"):
        np.testing.assert_allclose(float(np.mean(np.asarray(mb[key]))),
                                   float(np.mean(np.asarray(ms[key]))),
                                   rtol=2e-5, err_msg=key)
    np.testing.assert_allclose(float(mb["ebm/d_loss_"]),
                               float(ms["ebm/d_loss_"]), rtol=1e-6)
