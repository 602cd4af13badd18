"""Phase-decomposed upsample (Upsample.up_impl='phase'): exact algebra
vs the reference-semantics resize path.

conv3x3(nearest_up2(x)) == pixel_shuffle(4 x conv2x2(x)) with
phase-specific tap sums — see models/unet_small.py Upsample docstring.
Reference op being matched: /root/reference/models/DxMI/unet_small.py:51-66.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.models.unet_small import UNetSmall, Upsample


def test_upsample_phase_matches_resize_exact():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    a = Upsample(with_conv=True, dtype=jnp.float32)
    b = Upsample(with_conv=True, dtype=jnp.float32, up_impl="phase")
    params = a.init(jax.random.key(1), x)["params"]
    ya = a.apply({"params": params}, x)
    yb = b.apply({"params": params}, x)
    assert ya.shape == yb.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=1e-5, atol=1e-6)


def test_upsample_phase_odd_sizes_and_grad():
    """Non-square map + gradient flow through the phase path."""
    x = jax.random.normal(jax.random.key(2), (1, 5, 7, 8))
    b = Upsample(with_conv=True, dtype=jnp.float32, up_impl="phase")
    params = b.init(jax.random.key(3), x)["params"]
    a = Upsample(with_conv=True, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(b.apply({"params": params}, x)),
        np.asarray(a.apply({"params": params}, x)), rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda p: b.apply({"params": p}, x).sum())(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(g))


def test_unet_small_up_phase_matches_resize():
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0, in_channels=3,
              resolution=16, dtype=jnp.float32)
    net_a = UNetSmall(**kw)
    net_b = UNetSmall(**kw, up_impl="phase")
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([1, 5])
    params = net_a.init(jax.random.key(1), x, t)["params"]
    pb = net_b.init(jax.random.key(1), x, t)["params"]
    # identical param trees (checkpoint compatible)
    assert jax.tree.structure(params) == jax.tree.structure(pb)
    ya = np.asarray(net_a.apply({"params": params}, x, t))
    yb = np.asarray(net_b.apply({"params": params}, x, t))
    np.testing.assert_allclose(yb, ya, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["resize", "phase"])
def test_unet_small_up_phase_int8_static_runs(impl):
    """Static-int8 phase path: calibrates (module-level act_scale, like
    merged-qkv) and stays in the int8-noise class of the resize-int8
    path (different weight-rounding of the tap sums => not bit-equal)."""
    from dxmi_tpu.samplers.var import VARSampler

    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0, in_channels=3,
              resolution=16, dtype=jnp.float32, quant_int8="static")
    net = UNetSmall(**kw, up_impl=impl)
    sampler = VARSampler(net, n_timesteps=4, sample_shape=(3, 16, 16),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    params = sampler.calibrate_quant(params, jax.random.key(3),
                                     n_sample=4, n_rounds=1)
    x = sampler.sample(params, jax.random.key(5), 4)["sample"]
    assert np.isfinite(np.asarray(x)).all()
