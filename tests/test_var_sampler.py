"""VARSampler tests: shapes, analytic single-step math, grad flow, and
trajectory/step consistency."""
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.samplers.var import VARSampler, gaussian_logp_mean
from dxmi_tpu.schedules import var_schedule


class ConstEps(nn.Module):
    """Stub noise-prediction net returning a learnable constant field."""

    value: float = 0.0

    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        c = self.param("c", lambda k, s: jnp.full(s, self.value), (1,))
        return jnp.ones_like(x) * c


@pytest.fixture(scope="module")
def sampler():
    return VARSampler(ConstEps(value=0.25), n_timesteps=4,
                      sample_shape=(3, 8, 8), trainable_beta="fix_last")


@pytest.fixture(scope="module")
def params(sampler):
    return sampler.init_params(jax.random.key(0))


def test_init_params_log_betas(sampler, params):
    sch = sampler.schedule
    np.testing.assert_allclose(np.asarray(params["log_betas"]),
                               np.log(np.asarray(sch.init_sigma)), rtol=1e-6)


def test_sample_step_analytic(sampler, params):
    """One step must equal the closed-form ancestral update."""
    sch = sampler.schedule
    B = 3
    x = jax.random.normal(jax.random.key(1), (B, 8, 8, 3))
    t = jnp.array([0, 1, 3])
    key = jax.random.key(2)
    d = sampler.sample_step(params, x, t, key)

    eps = jnp.full_like(x, 0.25)
    x_mult = jnp.take(sch.x_mult, t)[:, None, None, None]
    eps_mult = jnp.take(sch.eps_mult, t)[:, None, None, None]
    mean = x * x_mult + eps_mult * eps
    np.testing.assert_allclose(np.asarray(d["mean"]), np.asarray(mean), rtol=1e-5)

    sig = np.exp(np.asarray(params["log_betas"]))
    sig[-1] = 1e-3  # fix_last pin
    np.testing.assert_allclose(np.asarray(d["sigma"]),
                               sig[np.asarray(t)], rtol=1e-6)

    # logp closed form
    z = (np.asarray(d["sample"]) - np.asarray(mean)) / sig[np.asarray(t)][:, None, None, None]
    ref_logp = (-0.5 * z**2 - np.log(sig[np.asarray(t)])[:, None, None, None]
                - 0.5 * math.log(2 * math.pi)).reshape(B, -1).mean(1)
    np.testing.assert_allclose(np.asarray(d["logp"]), ref_logp, rtol=1e-4)


def test_sample_trajectory_contract(sampler, params):
    d = sampler.sample(params, jax.random.key(3), n_sample=5)
    T = sampler.n_timesteps
    assert d["sample"].shape == (5, 8, 8, 3)
    assert d["l_sample"].shape == (T + 1, 5, 8, 8, 3)
    assert d["logp"].shape == (T, 5)
    assert d["mean"].shape == (T, 5, 8, 8, 3)
    assert d["sigma"].shape == (T, 5)
    np.testing.assert_allclose(np.asarray(d["sample"]),
                               np.asarray(d["l_sample"][-1]))
    assert np.isfinite(np.asarray(d["logp"])).all()
    # per-step sigma rows equal the effective sigma vector
    sig = np.asarray(sampler.sigmas_all(params))
    np.testing.assert_allclose(np.asarray(d["sigma"][:, 0]), sig, rtol=1e-6)
    # entropy = log sigma
    np.testing.assert_allclose(np.asarray(d["entropy"][:, 0]), np.log(sig), rtol=1e-5)


def test_grad_flows_to_log_betas_and_net(sampler, params):
    def loss(p):
        d = sampler.sample_step(p, jnp.ones((2, 8, 8, 3)), jnp.array([1, 2]),
                                jax.random.key(0))
        return (d["sample"] ** 2).mean() - d["logp"].mean()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["log_betas"][1])) > 0
    assert float(jnp.abs(g["net"]["c"][0])) > 0
    # fix_last: terminal sigma is pinned -> no gradient reaches index T-1
    def loss_last(p):
        d = sampler.sample_step(p, jnp.ones((2, 8, 8, 3)), jnp.array([3, 3]),
                                jax.random.key(0))
        return d["logp"].mean()
    g = jax.grad(loss_last)(params)
    assert float(jnp.abs(g["log_betas"][3])) == 0.0


def test_trainable_false_uses_schedule():
    s = VARSampler(ConstEps(), n_timesteps=4, sample_shape=(3, 8, 8),
                   trainable_beta=False)
    p = s.init_params(jax.random.key(0))
    assert "log_betas" in p  # kept for pytree uniformity
    sig = np.asarray(s.sigmas_all(p))
    sch = s.schedule
    np.testing.assert_allclose(sig[:-1], np.asarray(sch.sigma_q)[:-1], rtol=1e-6)
    assert sig[-1] == pytest.approx(1e-3)


def test_gaussian_logp_stop_gradient():
    x = jnp.ones((2, 4))
    mean = jnp.zeros((2, 4))
    sigma = jnp.full((2, 4), 0.5)

    def f(m):
        return gaussian_logp_mean(x, m, sigma).sum()

    g = jax.grad(f)(mean)
    # d/dmean of -(x-m)^2/(2 s^2) averaged over 4 dims = (x-m)/s^2 / 4
    np.testing.assert_allclose(np.asarray(g), np.full((2, 4), 1.0 / 0.25 / 4),
                               rtol=1e-5)


def test_sample_chunked_contract(sampler, params):
    """sample_chunked must preserve the d_sample contract exactly: same
    tree/shapes as one big batch, and chunk c's leaves equal a direct
    sample() with the c-th split key at the chunk batch."""
    from dxmi_tpu.samplers import sample_chunked

    key = jax.random.key(5)
    d1 = sampler.sample(params, key, 8)
    d2 = sample_chunked(sampler, params, key, 8, 2)
    assert set(d1) == set(d2)
    for k in d1:
        assert d1[k].shape == d2[k].shape, k

    keys = jax.random.split(key, 2)
    c0 = sampler.sample(params, keys[0], 4)
    np.testing.assert_allclose(np.asarray(d2["sample"][:4]),
                               np.asarray(c0["sample"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2["l_sample"][:, :4]),
                               np.asarray(c0["l_sample"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2["logp"][:, 4:]),
                               np.asarray(sampler.sample(params, keys[1], 4)["logp"]),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        sample_chunked(sampler, params, key, 8, 3)
