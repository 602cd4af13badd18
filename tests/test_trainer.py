"""DxMI trainer tests: end-to-end tick on tiny shapes, TD semantics,
adaptive velocity regularisation, and multi-device data parallelism."""
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


class TinyEps(nn.Module):
    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        h = jax.nn.silu(h + t[:, None, None, None] * 0.01)
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(h)


T = 4
B = 8
RES = 8


@pytest.fixture(scope="module")
def setup():
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False,
                                                  learn_out_scale=True))
    trainer = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                          n_timesteps=T, use_sampler_beta=True,
                          adavelreg=0.99, time_cost=0.0, time_cost_sig=1.0)
    trainer.set_models(sampler, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4)

    sp = sampler.init_params(jax.random.key(0))
    x = jnp.zeros((1, RES, RES, 3))
    vp = value.init(jax.random.key(1), x, jnp.zeros((1,), jnp.int32))["params"]
    state = trainer.init_state(sp, vp)
    return trainer, sampler, value, state


def test_buffer_layout(setup):
    trainer, sampler, value, state = setup
    d = sampler.sample(state.sampler_params, jax.random.key(2), B)
    b = buf.from_d_sample(d)
    assert b.state.shape == (1, T, B, RES, RES, 3)
    np.testing.assert_allclose(np.asarray(b.next_state[0, -1]),
                               np.asarray(d["sample"]))
    flat = b.flat()
    assert flat["state"].shape == (T * B, RES, RES, 3)
    assert flat["timestep"].shape == (T * B,)
    # row i*B+j has timestep i
    np.testing.assert_array_equal(np.asarray(flat["timestep"][:B]), 0)
    np.testing.assert_array_equal(np.asarray(flat["timestep"][-B:]), T - 1)


def test_betas_for_q_from_sampler(setup):
    trainer, sampler, *_ = setup
    betas = np.asarray(trainer.init_betas_for_q())
    np.testing.assert_allclose(betas, sampler.user_defined_eta, rtol=1e-6)


def test_update_f_v_tick(setup):
    trainer, sampler, value, state = setup
    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    b = buf.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    v_before = jax.tree.leaves(state.v_params)[0].copy()
    betas_before = np.asarray(state.betas_for_q)
    state2, m = trainer.update_f_v(state, img, b, jax.random.key(5))

    # value params moved, sampler params untouched
    assert not np.allclose(np.asarray(jax.tree.leaves(state2.v_params)[0]),
                           np.asarray(v_before))
    assert np.allclose(
        np.asarray(jax.tree.leaves(state2.sampler_params)[0]),
        np.asarray(jax.tree.leaves(state.sampler_params)[0]))

    for k in ("ebm/d_loss_", "ebm/pos_e_", "ebm/neg_e_", "ebm/v_loss_"):
        assert np.isfinite(float(m[k])), k

    # adavelreg EMA: beta' = 0.99 beta + 0.01 * flip(mean (dx)^2)
    diff = ((np.asarray(b.next_state[0]) - np.asarray(b.state[0])) ** 2
            ).reshape(T, -1).mean(1)[::-1]
    expect = betas_before * 0.99 + 0.01 * diff
    np.testing.assert_allclose(np.asarray(state2.betas_for_q), expect, rtol=1e-5)

    # TD sweep ran backward: t sequence is T-1..0
    np.testing.assert_array_equal(np.asarray(m["per_step/t"]),
                                  np.arange(T - 1, -1, -1))


def test_update_sampler_tick(setup):
    trainer, sampler, value, state = setup
    d = sampler.sample(state.sampler_params, jax.random.key(6), B)
    b = buf.from_d_sample(d)

    lb_before = np.asarray(state.sampler_params["log_betas"])
    state2, m = trainer.update_sampler(state, b, jax.random.key(7), n_generator=1)
    lb_after = np.asarray(state2.sampler_params["log_betas"])

    assert np.isfinite(float(m["sampler/sampler_loss_"]))
    # log_betas learned (at least one non-terminal entry moved)
    assert not np.allclose(lb_before[:-1], lb_after[:-1])
    assert m["per_step/sigma"].shape == (T,)
    # value params untouched by the sampler update
    assert np.allclose(np.asarray(jax.tree.leaves(state2.v_params)[0]),
                       np.asarray(jax.tree.leaves(state.v_params)[0]))


def test_td_is_sequential(setup):
    """The TD sweep must apply T optimizer steps sequentially: running it
    with repeat_value_update=2 must differ from repeating a 1-sweep call
    with reset opt state (i.e. the sweep carries state)."""
    trainer, sampler, value, state = setup
    d = sampler.sample(state.sampler_params, jax.random.key(8), B)
    b = buf.from_d_sample(d)
    img = jax.random.normal(jax.random.key(9), (B, RES, RES, 3))

    s1, m1 = trainer.update_f_v(state, img, b, jax.random.key(10))
    # the last TD step (t=0) sees a value net already updated T-1 times;
    # its v_loss differs from the first step's unless the sweep is parallel
    v_losses = np.asarray(m1["per_step/value"])
    assert not np.allclose(v_losses.min(), v_losses.max())


def test_data_parallel_update(setup):
    """update_f_v under a 'data'-sharded batch on the 8-device CPU mesh
    equals the single-device result (psum-of-grads == full-batch grads)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    trainer, sampler, value, state = setup
    d = sampler.sample(state.sampler_params, jax.random.key(3), B)
    b = buf.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    bs = NamedSharding(mesh, P(None, None, "data"))  # (K, T, B, ...)
    imgs = NamedSharding(mesh, P("data"))
    b_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, None, "data"))), b)
    img_sh = jax.device_put(img, imgs)

    s_ref, m_ref = trainer.update_f_v(state, img, b, jax.random.key(5))
    s_sh, m_sh = trainer.update_f_v(state, img_sh, b_sh, jax.random.key(5))
    np.testing.assert_allclose(float(m_ref["ebm/d_loss_"]),
                               float(m_sh["ebm/d_loss_"]), rtol=1e-4)
    lhs = np.asarray(jax.tree.leaves(s_ref.v_params)[0])
    rhs = np.asarray(jax.tree.leaves(s_sh.v_params)[0])
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-6)


def test_sample_guidance(setup):
    """Value-guided sampling (trainer.py:171-216): shapes, finiteness, and
    that guidance actually displaces samples vs the plain policy."""
    trainer, sampler, value, state = setup
    d = trainer.sample_guidance(state, jax.random.key(11), n_sample=4,
                                guidance_scale=0.5)
    assert d["sample"].shape == (4, RES, RES, 3)
    assert d["l_sample"].shape == (T + 1, 4, RES, RES, 3)
    assert d["guidance"].shape == (T, 4, RES, RES, 3)
    assert np.isfinite(np.asarray(d["logp_traj"])).all()
    g_norm = float(np.abs(np.asarray(d["guidance"])).mean())
    assert g_norm > 0

    d0 = trainer.sample_guidance(state, jax.random.key(11), n_sample=4,
                                 guidance_scale=0.0)
    # zero scale reduces to the plain policy (same keys -> same noise)
    assert not np.allclose(np.asarray(d["sample"]), np.asarray(d0["sample"]))


def test_fused_train_step_matches_phased(setup):
    """trainer.train_step (one jitted dispatch) must reproduce the
    sample -> update_f_v -> update_sampler phase sequence exactly when
    given the same subkeys."""
    trainer, sampler, value, state = setup
    img = jax.random.normal(jax.random.key(40), (B, RES, RES, 3))
    key = jax.random.key(41)

    fused_state, m = trainer.train_step(state, img, key, n_generator=1)

    k1, k2, k3 = jax.random.split(key, 3)
    d = sampler.sample(state.sampler_params, k1, B)
    traj = buf.from_d_sample(d)
    ref_state, m1 = trainer.update_f_v(state, img, traj, k2)
    ref_state, m2 = trainer.update_sampler(ref_state, traj, k3, n_generator=1)

    for a, b in zip(jax.tree.leaves(fused_state.sampler_params),
                    jax.tree.leaves(ref_state.sampler_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(fused_state.v_params),
                    jax.tree.leaves(ref_state.v_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(m["ebm/d_loss_"]),
                               float(m1["ebm/d_loss_"]), rtol=1e-5)
    np.testing.assert_allclose(float(m["sampler/sampler_loss_"]),
                               float(m2["sampler/sampler_loss_"]), rtol=1e-5)


def test_train_step_sample_chunks(setup):
    """sample_chunks>1 keeps the fused step valid: finite metrics, same
    metric keys, params updated."""
    trainer, sampler, value, state = setup
    old = trainer.sample_chunks
    trainer.sample_chunks = 2
    try:
        assert B % 2 == 0
        s2, m2 = trainer.train_step(state, jnp.zeros((B, RES, RES, 3)),
                                    jax.random.key(21))
    finally:
        trainer.sample_chunks = old
    s1, m1 = trainer.train_step(state, jnp.zeros((B, RES, RES, 3)),
                                jax.random.key(21))
    assert set(m1) == set(m2)
    for k, v in m2.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # the chunked step consumed different per-chunk keys -> different
    # trajectory, but both must actually move the params
    a = np.asarray(jax.tree.leaves(s2.v_params)[0])
    b_ = np.asarray(jax.tree.leaves(state.v_params)[0])
    assert not np.allclose(a, b_)
