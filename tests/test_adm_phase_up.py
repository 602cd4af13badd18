"""ADM phase-decomposed decoder upsample (UNetADM(up_impl='phase')):
matches the resize-path function exactly (fp reassociation class) in
both resblock_updown and plain conv_resample decoders, with an
identical param tree. Reference ops: /root/reference/models/cm/
unet.py:79-100 (Upsample) / 147-260 (ResBlock h_upd)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxmi_tpu.models.unet_adm import create_unet_adm


def _pair(updown):
    kw = dict(image_size=16, num_channels=32, num_res_blocks=1,
              attention_resolutions="8", channel_mult="1,2",
              class_cond=False, use_fp16=False,
              use_scale_shift_norm=True, resblock_updown=updown)
    return (create_unet_adm(**kw, up_impl="resize"),
            create_unet_adm(**kw, up_impl="phase"))


@pytest.mark.parametrize("updown", [True, False])
def test_adm_up_phase_matches_resize(updown):
    a, b = _pair(updown)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([0.3, 0.8])
    pa = a.init(jax.random.key(1), x, t)["params"]
    pb = b.init(jax.random.key(1), x, t)["params"]
    assert jax.tree.structure(pa) == jax.tree.structure(pb)
    # zero-init out conv makes raw-init outputs identically 0 — perturb
    pa = jax.tree.map(
        lambda k: jax.random.normal(jax.random.key(7), k.shape) * 0.05, pa)
    ya = np.asarray(a.apply({"params": pa}, x, t))
    yb = np.asarray(b.apply({"params": pa}, x, t))
    assert np.abs(ya).max() > 0
    np.testing.assert_allclose(yb, ya, rtol=1e-4, atol=1e-5)


def test_adm_up_phase_grad_finite():
    _, b = _pair(True)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
    t = jnp.array([0.5])
    p = b.init(jax.random.key(3), x, t)["params"]
    g = jax.grad(lambda p: (b.apply({"params": p}, x, t) ** 2).sum())(p)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))
