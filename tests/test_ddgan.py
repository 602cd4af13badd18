"""DDGAN sampler/generator tests: VP schedule math, posterior identities,
d_step contract, z-conditioning, and a trainer tick."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.samplers.ddgan import DDGANSampler, ddgan_schedule, _vp_variance
from dxmi_tpu.models.ncsnpp import NCSNpp, NCSNppArgs


class TinyGen(nn.Module):
    """Stub x0-generator so sampler tests stay cheap."""

    nz: int = 100

    @nn.compact
    def __call__(self, x, t, z, *, deterministic=True):
        zb = nn.Dense(8, name="zproj")(z)
        h = nn.Conv(8, (3, 3), padding=1)(x) + zb[:, None, None, :]
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(jax.nn.silu(h))


def test_vp_schedule_identities():
    T = 4
    sch = ddgan_schedule(T)
    # posterior coefficient identity: at each DDGAN time t,
    # c1 * sqrt(a_bar) + c2 * ... -> verify via reconstruction instead:
    # if x_t = sqrt(a_bar_t) x0 + sqrt(1-a_bar_t) eps and the prediction is
    # exact, the posterior mean must interpolate toward x0; at the final
    # sampling step (DDGAN t=1, a_bar_prev=1) mean == x0 exactly:
    np.testing.assert_allclose(float(sch.x0_coef[-1] + 0.0), float(sch.x0_coef[-1]))
    t = np.arange(0, T + 1) / T * (1 - 1e-3) + 1e-3
    var = _vp_variance(t)
    a_bar = 1 - var
    betas = 1 - a_bar[1:] / a_bar[:-1]
    alphas = 1 - betas
    # last sampling step uses DDGAN t=1: c1 = beta_1 * 1 / (1 - a_bar_1),
    # c2 = 0 * sqrt(alpha_1) / ... with a_bar_prev = 1
    c1_expect = betas[0] * 1.0 / (1 - np.cumprod(alphas)[0])
    np.testing.assert_allclose(float(sch.x0_coef[-1]), c1_expect, rtol=1e-5)
    np.testing.assert_allclose(float(sch.xt_coef[-1]), 0.0, atol=1e-7)
    # analytic terminal sigma is 0; init floor is 1e-3
    assert float(sch.sigma_q[-1]) == 0.0
    assert float(sch.init_sigma[-1]) == pytest.approx(1e-3)
    # exact-prediction consistency: with perfect x0 and zero noise, applying
    # all steps starting from x_T must converge to x0 (coefficients sum to
    # 1 in the x0/xt basis when the chain contracts) — check c1+c2*<1 decay
    assert np.all(np.asarray(sch.x0_coef) > 0)
    assert np.all(np.asarray(sch.xt_coef) >= 0)


def test_ddgan_sampler_contract():
    s = DDGANSampler(TinyGen(), n_timesteps=4, sample_shape=(3, 8, 8),
                     trainable_beta="fix_last", use_z=True, nz=16)
    p = s.init_params(jax.random.key(0))
    assert p["log_betas"].shape == (4,)
    d = s.sample(p, jax.random.key(1), n_sample=3)
    assert d["sample"].shape == (3, 8, 8, 3)
    assert d["l_sample"].shape == (5, 3, 8, 8, 3)
    assert np.isfinite(np.asarray(d["logp"])).all()

    d1 = s.sample_step(p, jnp.ones((2, 8, 8, 3)), jnp.array([0, 3]),
                       jax.random.key(2))
    assert d1["sample"].shape == (2, 8, 8, 3)
    assert float(d1["sigma"][1]) == pytest.approx(1e-3)


def test_ddgan_use_z_changes_output():
    s = DDGANSampler(TinyGen(), n_timesteps=4, sample_shape=(3, 8, 8),
                     use_z=True, nz=16)
    p = s.init_params(jax.random.key(0))
    x = jnp.ones((2, 8, 8, 3))
    a = s.sample_step(p, x, jnp.array([1, 1]), jax.random.key(1))
    b = s.sample_step(p, x, jnp.array([1, 1]), jax.random.key(2))
    # different z (and noise) -> different means (z reaches the generator)
    assert not np.allclose(np.asarray(a["mean"]), np.asarray(b["mean"]))


def test_ncsnpp_shapes():
    cfg = NCSNppArgs(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), nz=16, z_emb_dim=32, n_mlp=2)
    model = NCSNpp(config=cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.0, 3.0])
    z = jnp.zeros((2, 16))
    params = jax.jit(model.init)(jax.random.key(0), x, t, z)
    out = model.apply(params, x, t, z)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh head


def test_ddgan_int8_calibrate_and_sample():
    """NCSN++ quant_int8='static' + DDGANSampler.calibrate_quant: same
    contract as the UNetSmall/ADM int8 paths; int8 sampling tracks fp."""
    cfg = NCSNppArgs(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), nz=16, z_emb_dim=32, n_mlp=2)
    net_q = NCSNpp(config=cfg, quant_int8="static")
    s = DDGANSampler(net_q, n_timesteps=4, sample_shape=(3, 16, 16),
                     trainable_beta="fix_last", use_z=True)
    p = s.init_params(jax.random.key(0))
    # randomize params (zero-init output convs make int8 == fp trivially)
    leaves, tdef = jax.tree.flatten(p["net"])
    ks = jax.random.split(jax.random.key(7), len(leaves))
    p["net"] = jax.tree.unflatten(
        tdef, [jax.random.normal(k, l.shape, l.dtype) * 0.05
               for k, l in zip(ks, leaves)])

    p = s.calibrate_quant(p, jax.random.key(1), n_sample=4, n_rounds=1)
    assert "quant_scales" in p
    assert max(float(jnp.max(a))
               for a in jax.tree.leaves(p["quant_scales"])) > 0

    d_q = jax.jit(lambda pp, k: s.sample(pp, k, 4))(p, jax.random.key(2))
    assert np.isfinite(np.asarray(d_q["sample"])).all()

    # fp twin with identical params/keys: int8 drift stays bounded
    s_fp = DDGANSampler(NCSNpp(config=cfg), n_timesteps=4,
                        sample_shape=(3, 16, 16), trainable_beta="fix_last",
                        use_z=True)
    p_fp = {"net": p["net"], "log_betas": p["log_betas"]}
    d_fp = jax.jit(lambda pp, k: s_fp.sample(pp, k, 4))(p_fp,
                                                        jax.random.key(2))
    a = np.asarray(d_q["sample"], np.float32)
    b = np.asarray(d_fp["sample"], np.float32)
    rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8)
    assert rel < 0.25, rel  # trajectory-compounded int8 drift bound


def test_ddgan_trainer_tick():
    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi import DxMITrainer

    T, B, RES = 4, 4, 8
    s = DDGANSampler(TinyGen(), n_timesteps=T, sample_shape=(3, RES, RES),
                     use_z=True, nz=16)
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                     n_timesteps=T, use_sampler_beta=True, value_resample=True,
                     adavelreg=0.99, time_cost=0.0, time_cost_sig=1.0)
    tr.set_models(s, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)

    d = s.sample(state.sampler_params, jax.random.key(2), B)
    b = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))
    state, m1 = tr.update_f_v(state, img, b, jax.random.key(4))
    state, m2 = tr.update_sampler(state, b, jax.random.key(5))
    assert np.isfinite(float(m1["ebm/d_loss_"]))
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))


def test_vp_posterior_vs_float64_torch():
    """Cross-check the DDGAN VP posterior coefficients against an
    independent float64 torch derivation of the same published recipe."""
    torch = pytest.importorskip("torch")

    Tn = 4
    t = torch.arange(0, Tn + 1, dtype=torch.float64) / Tn
    t = t * (1 - 1e-3) + 1e-3
    log_mean = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
    var = 1 - torch.exp(2 * log_mean)
    a_bar = 1 - var
    betas = 1 - a_bar[1:] / a_bar[:-1]
    alphas = 1 - betas
    ab = torch.cumprod(alphas, 0)
    ab_prev = torch.cat([torch.ones(1, dtype=torch.float64), ab[:-1]])
    c1 = betas * torch.sqrt(ab_prev) / (1 - ab)
    c2 = (1 - ab_prev) * torch.sqrt(alphas) / (1 - ab)
    post_var = betas * (1 - ab_prev) / (1 - ab)

    sch = ddgan_schedule(Tn)
    order = np.arange(Tn)[::-1]
    np.testing.assert_allclose(np.asarray(sch.x0_coef),
                               c1.numpy()[order], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sch.xt_coef),
                               c2.numpy()[order], rtol=1e-5)
    std = np.sqrt(np.clip(post_var.numpy(), 0, None))
    std[0] = 0.0
    np.testing.assert_allclose(np.asarray(sch.sigma_q), std[order],
                               rtol=1e-5, atol=1e-8)


def test_ddgan_int8_skip_attn():
    """quant_skip_attn keeps the attention 1x1 convs bf16: same param
    tree, runs, and drift vs fp cannot exceed the all-int8 variant's by
    more than noise."""
    cfg = NCSNppArgs(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), nz=16, z_emb_dim=32, n_mlp=2)
    s_fp = DDGANSampler(NCSNpp(config=cfg), n_timesteps=4,
                        sample_shape=(3, 16, 16), trainable_beta="fix_last",
                        use_z=True)
    p = s_fp.init_params(jax.random.key(0))
    leaves, tdef = jax.tree.flatten(p["net"])
    ks = jax.random.split(jax.random.key(7), len(leaves))
    p["net"] = jax.tree.unflatten(
        tdef, [jax.random.normal(k, l.shape, l.dtype) * 0.05
               for k, l in zip(ks, leaves)])
    b = np.asarray(jax.jit(lambda pp, k: s_fp.sample(pp, k, 4))(
        p, jax.random.key(2))["sample"], np.float32)

    def drift(**kw):
        s = DDGANSampler(NCSNpp(config=cfg, quant_int8="static", **kw),
                         n_timesteps=4, sample_shape=(3, 16, 16),
                         trainable_beta="fix_last", use_z=True)
        pq = s.calibrate_quant({"net": p["net"], "log_betas": p["log_betas"]},
                               jax.random.key(1), n_sample=4, n_rounds=1)
        a = np.asarray(jax.jit(lambda pp, k: s.sample(pp, k, 4))(
            pq, jax.random.key(2))["sample"], np.float32)
        return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8)

    full, skip = drift(), drift(quant_skip_attn=True)
    assert skip <= full * 1.05 + 1e-6, (full, skip)


def test_ncsnpp_bf16_dtype_close():
    """dtype=bf16 torso (params fp32) stays in the bf16 drift class of
    the fp32 forward; output dtype is fp32 either way."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dxmi_tpu.models.ncsnpp import NCSNpp, NCSNppArgs

    cfg = NCSNppArgs(nf=32, ch_mult=(1, 2), num_res_blocks=1,
                     image_size=16, attn_resolutions=(8,))
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([1, 2])
    z = jax.random.normal(jax.random.key(1), (2, 100))
    net = NCSNpp(config=cfg)
    p = net.init(jax.random.key(2), x, t, z)
    a = np.asarray(net.apply(p, x, t, z))
    b = np.asarray(NCSNpp(config=cfg, dtype=jnp.bfloat16).apply(p, x, t, z))
    assert b.dtype == np.float32
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)
    assert rel < 0.02, rel
