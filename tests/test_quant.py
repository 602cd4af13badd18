"""Int8 quantized-conv tests: math, param-tree compatibility, model mode."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.ops.quant import QConv, int8_conv, quantize_per_channel, quantize_per_tensor


def test_quantize_roundtrip_accuracy():
    w = jax.random.normal(jax.random.key(0), (3, 3, 16, 32)) * 0.2
    w_i8, scale = quantize_per_channel(w)
    back = w_i8.astype(jnp.float32) * scale
    rel = float(jnp.abs(back - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # <= half-LSB of 127 levels per channel

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16)) * 3
    x_i8, s = quantize_per_tensor(x)
    assert x_i8.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(x_i8, np.float32) * float(s),
                               np.asarray(x), atol=float(s) * 0.51)


def test_int8_conv_close_to_fp():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 16)) * 0.1
    b = jax.random.normal(jax.random.key(2), (16,)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = int8_conv(x, k, b, out_dtype=jnp.float32)
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.02, rel


def test_qconv_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 4))
    q = QConv(8, (3, 3))
    c = nn.Conv(8, (3, 3), padding=1)
    pq = q.init(jax.random.key(0), x)["params"]
    pc = c.init(jax.random.key(0), x)["params"]
    assert jax.tree.structure(pq) == jax.tree.structure(pc)
    assert pq["kernel"].shape == pc["kernel"].shape
    # fp params from a converted checkpoint drop straight in
    out = q.apply({"params": pc}, jnp.ones((1, 8, 8, 4)))
    assert out.shape == (1, 8, 8, 8)


def test_unet_quant_mode_runs_and_tracks_fp():
    from dxmi_tpu.models.unet_small import UNetSmall

    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0, in_channels=3,
              resolution=16)
    fp = UNetSmall(**kw)
    q = UNetSmall(**kw, quant_int8=True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([10.0, 400.0])
    params = fp.init(jax.random.key(1), x, t)
    a = fp.apply(params, x, t)
    b = q.apply(params, x, t)  # same param tree
    assert b.shape == a.shape
    rel = float(jnp.abs(a - b).mean() / (jnp.abs(a).mean() + 1e-8))
    assert rel < 0.2, rel  # random-weight net; loose sanity bound


def test_unet_quant_skip_knobs_reduce_error():
    """quant_skip_attn / quant_skip_last_level keep those modules bf16:
    same param tree, and the fp-vs-quant error cannot exceed the all-int8
    variant's by more than noise (they quantize strictly fewer convs)."""
    from dxmi_tpu.models.unet_small import UNetSmall

    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8, 16), dropout=0.0, in_channels=3,
              resolution=16)
    fp = UNetSmall(**kw)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([10.0, 400.0])
    params = fp.init(jax.random.key(1), x, t)
    a = fp.apply(params, x, t)

    def rel(skips):
        q = UNetSmall(**kw, quant_int8=True, **skips)
        b = q.apply(params, x, t)  # same param tree
        return float(jnp.abs(a - b).mean() / (jnp.abs(a).mean() + 1e-8))

    full = rel({})
    both = rel(dict(quant_skip_attn=True, quant_skip_last_level=True))
    assert both <= full * 1.05 + 1e-6, (full, both)
