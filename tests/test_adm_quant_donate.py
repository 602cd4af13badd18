"""ADM int8 (W8A8 static) path and donated-state trainer updates."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.models.unet_adm import UNetADM
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buf
from dxmi_tpu.trainers.dxmi import DxMITrainer

ADM_KW = dict(image_size=16, model_channels=32, num_res_blocks=1,
              attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
              num_classes=10, dtype=jnp.bfloat16, softmax_f32=False)


def test_adm_int8_calibrate_and_sample():
    net = UNetADM(**ADM_KW, quant_int8="static")
    s = EDMSampler(net, KarrasDenoiser(), n_timesteps=4,
                   sample_shape=(3, 16, 16), class_cond=True, num_classes=10,
                   trainable_beta="fix_last")
    p = s.init_params(jax.random.key(0))
    p = s.calibrate_quant(p, jax.random.key(1), n_sample=4, n_rounds=1)
    assert "quant_scales" in p
    # at least one QConv recorded a nonzero range
    assert max(float(jnp.max(a)) for a in jax.tree.leaves(p["quant_scales"])) > 0
    d = jax.jit(lambda pp, k: s.sample(pp, k, 4))(p, jax.random.key(2))
    assert np.isfinite(np.asarray(d["sample"])).all()


def test_adm_int8_forward_close_to_fp():
    """With randomized (non-zero-init) params the int8 forward tracks the
    full-precision forward."""
    mq = UNetADM(**ADM_KW, quant_int8="static")
    v = mq.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))
    leaves, tdef = jax.tree.flatten(v["params"])
    ks = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree.unflatten(
        tdef, [jax.random.normal(k, l.shape, l.dtype) * 0.05
               for k, l in zip(ks, leaves)])
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 3))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), jnp.int32)
    _, upd = mq.apply({"params": params, "quant_scales": v["quant_scales"]},
                      x, t, y, mutable=["quant_scales"])
    out_q = mq.apply({"params": params,
                      "quant_scales": upd["quant_scales"]}, x, t, y)
    m0 = UNetADM(**ADM_KW)
    out_fp = m0.apply({"params": params}, x, t, y)
    a = np.asarray(out_q, np.float32)
    b = np.asarray(out_fp, np.float32)
    rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8)
    assert rel < 0.05, rel


class TinyEps(nn.Module):
    @nn.compact
    def __call__(self, x, t, *, deterministic=True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        h = jax.nn.silu(h + t[:, None, None, None] * 0.01)
        return nn.Conv(x.shape[-1], (3, 3), padding=1)(h)


def test_donated_updates_match_undonated():
    T, B, RES = 4, 8, 8

    def make(donate):
        sampler = VARSampler(TinyEps(), n_timesteps=T,
                             sample_shape=(3, RES, RES),
                             trainable_beta="fix_last")
        value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
        tr = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True)
        tr.set_models(sampler, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4,
                      donate=donate)
        sp = sampler.init_params(jax.random.key(0))
        vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
        return tr, sampler, tr.init_state(sp, vp)

    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    results = []
    for donate in (False, True):
        tr, sampler, state = make(donate)
        d = sampler.sample(state.sampler_params, jax.random.key(3), B)
        b = buf.from_d_sample(d)
        state, _ = tr.update_f_v(state, img, b, jax.random.key(5))
        state, m = tr.update_sampler(state, b, jax.random.key(6),
                                     n_generator=1)
        results.append((jax.tree.leaves(state.v_params)[0],
                        float(m["sampler/sampler_loss_"])))

    np.testing.assert_allclose(np.asarray(results[0][0]),
                               np.asarray(results[1][0]), atol=1e-6)
    assert abs(results[0][1] - results[1][1]) < 1e-5
