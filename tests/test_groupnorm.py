"""Fused GroupNorm(+SiLU) tests: math vs flax GroupNorm, gradients."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.ops.groupnorm import fused_group_norm, group_norm_silu_reference


def test_reference_matches_flax_groupnorm():
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 64))
    scale = jax.random.normal(jax.random.key(1), (64,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.1

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    ours = group_norm_silu_reference(x, scale, bias, 32, 1e-6, silu=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    ours_silu = group_norm_silu_reference(x, scale, bias, 32, 1e-6, silu=True)
    np.testing.assert_allclose(np.asarray(ours_silu),
                               np.asarray(ref * jax.nn.sigmoid(ref)),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_reference_and_grads():
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 128))
    scale = jnp.ones((128,)) * 1.3
    bias = jnp.ones((128,)) * 0.2

    out = fused_group_norm(x, scale, bias, 32, 1e-6, True)
    ref = group_norm_silu_reference(x, scale, bias, 32, 1e-6, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def loss_fused(x, s, b):
        return (fused_group_norm(x, s, b, 32, 1e-6, True) ** 2).sum()

    def loss_ref(x, s, b):
        return (group_norm_silu_reference(x, s, b, 32, 1e-6, True) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_input_fp32_stats():
    x = (jax.random.normal(jax.random.key(0), (2, 8, 8, 128)) * 100
         ).astype(jnp.bfloat16)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    out = fused_group_norm(x, scale, bias, 32, 1e-6, False)
    assert out.dtype == jnp.bfloat16
    f = np.asarray(out, np.float32).reshape(2, -1, 32, 4)
    # normalized stats despite bf16 I/O
    assert abs(f.mean()) < 0.05
    assert abs(f.std() - 1.0) < 0.1


def test_fused_gn_silu_conv_reference_path():
    """The fused GN+SiLU+conv op (CPU falls back to the XLA composition):
    correctness vs the explicit sequence + gradients flow."""
    from dxmi_tpu.ops.conv_fused import (fused_gn_silu_conv,
                                         gn_silu_conv_reference)

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 128))
    gs = jnp.ones((128,)) * 1.2
    gb = jnp.zeros((128,)) + 0.1
    k = jax.random.normal(jax.random.key(1), (3, 3, 128, 128)) * 0.05
    b = jax.random.normal(jax.random.key(2), (128,)) * 0.1

    out = fused_gn_silu_conv(x, gs, gb, k, b, 32, 1e-6)
    ref = gn_silu_conv_reference(x, gs, gb, k, b, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda *a: (fused_gn_silu_conv(*a, 32, 1e-6) ** 2).sum(),
                  argnums=(0, 3))(x, gs, gb, k, b)
    g2 = jax.grad(lambda *a: (gn_silu_conv_reference(*a, 32, 1e-6) ** 2).sum(),
                  argnums=(0, 3))(x, gs, gb, k, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_unet_fuse_gn_conv_param_tree_compatible():
    from dxmi_tpu.models.unet_small import UNetSmall

    kw = dict(ch=128, out_ch=3, ch_mult=(1,), num_res_blocks=1,
              attn_resolutions=(), dropout=0.0, in_channels=3, resolution=8)
    import jax as _jax

    fp = UNetSmall(**kw)
    fu = UNetSmall(**kw, fuse_gn_conv=True)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([1.0, 2.0])
    p1 = fp.init(_jax.random.key(0), x, t)["params"]
    p2 = fu.init(_jax.random.key(0), x, t)["params"]
    assert _jax.tree.structure(p1) == _jax.tree.structure(p2)
    # fused model runs with the unfused model's params (same tree)
    a = fp.apply({"params": p1}, x, t)
    b = fu.apply({"params": p1}, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


def test_gn_stats_modes_agree(monkeypatch):
    """Every DXMI_GN_STATS formulation matches the two-pass fp32 reference
    within its precision class (bf16 modes ~1e-2 rel; fp32 one-pass ~1e-6)."""
    import os

    from dxmi_tpu.ops.groupnorm import group_norm_silu_reference

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64),
                          jnp.bfloat16) * 3.0 + 0.7
    scale = jax.random.normal(jax.random.key(1), (64,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.1

    monkeypatch.delenv("DXMI_GN_STATS", raising=False)
    ref = np.asarray(group_norm_silu_reference(x, scale, bias, 32, 1e-6,
                                               True), np.float32)
    for mode, tol in (("onepass", 2e-3), ("bf16", 3e-2),
                      ("bf16_onepass", 3e-2)):
        monkeypatch.setenv("DXMI_GN_STATS", mode)
        out = np.asarray(group_norm_silu_reference(x, scale, bias, 32, 1e-6,
                                                   True), np.float32)
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
        assert err < tol, f"{mode}: rel err {err:.2e}"


def test_gn_stats_subsampled(monkeypatch):
    """bf16_onepass_sub{2,4} estimate stats from every 2nd/4th spatial row:
    unbiased but noisier — outputs stay within a loose tolerance of exact
    stats on big maps, and small maps (< 256 positions) are untouched."""
    from dxmi_tpu.ops.groupnorm import group_norm_silu_reference

    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 64),
                          jnp.bfloat16) * 3.0 + 0.7
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))

    monkeypatch.delenv("DXMI_GN_STATS", raising=False)
    ref = np.asarray(group_norm_silu_reference(x, scale, bias, 32, 1e-6,
                                               True), np.float32)
    for mode, tol in (("bf16_onepass_sub2", 0.15), ("bf16_onepass_sub4",
                                                    0.25)):
        monkeypatch.setenv("DXMI_GN_STATS", mode)
        out = np.asarray(group_norm_silu_reference(x, scale, bias, 32, 1e-6,
                                                   True), np.float32)
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
        assert 0 < err < tol, f"{mode}: rel err {err:.2e}"

    # small map: sub modes fall back to exact stats (same values as
    # bf16_onepass)
    xs = x[:, :8, :8]
    monkeypatch.setenv("DXMI_GN_STATS", "bf16_onepass")
    exact = np.asarray(group_norm_silu_reference(xs, scale, bias, 32, 1e-6,
                                                 True), np.float32)
    monkeypatch.setenv("DXMI_GN_STATS", "bf16_onepass_sub4")
    sub = np.asarray(group_norm_silu_reference(xs, scale, bias, 32, 1e-6,
                                               True), np.float32)
    np.testing.assert_array_equal(exact, sub)
