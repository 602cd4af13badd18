"""Fused attention-block kernel: numerics vs the pure-JAX reference and
vs AttentionBlockADM's einsum path (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.ops.attn_block import (attn_block_reference, fused_attn_block,
                                     fused_attn_available)


def _mk(B=2, S=256, C=128, nh=2, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 8)
    x = jax.random.normal(ks[0], (B, S, C), dtype)
    gs = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    gb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    wq = jax.random.normal(ks[3], (C, 3 * C), jnp.float32) / np.sqrt(C)
    bq = 0.02 * jax.random.normal(ks[4], (3 * C,), jnp.float32)
    wp = jax.random.normal(ks[5], (C, C), jnp.float32) / np.sqrt(C)
    bp = 0.02 * jax.random.normal(ks[6], (C,), jnp.float32)
    return x, gs, gb, wq, bq, wp, bp


def test_gate(monkeypatch):
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    assert fused_attn_available(1024, 384, 6)      # ImageNet64 ds2
    assert fused_attn_available(256, 768, 12)      # LSUN S=256 map
    assert fused_attn_available(64, 768, 12)       # ds8 map (S=64)
    assert fused_attn_available(1024, 512, 8)      # LSUN-256 ds8 (r5:
    #   the raised 1024*512 activation bound admits it — measured win,
    #   19.94 vs 19.47 img/s at the record point, PERF.md r5)
    assert not fused_attn_available(1024, 768, 12) # VMEM bound
    assert not fused_attn_available(256, 1024, 16) # weight VMEM bound (fp)
    assert fused_attn_available(256, 1024, 16, int8=True)  # r5: half-size
    #   int8 weights admit C=1024 (LSUN 16^2/8^2 maps, 20.18 vs 19.94)
    assert not fused_attn_available(100, 128, 2)   # S % 64
    monkeypatch.delenv("DXMI_FUSED_ATTN_FORCE")
    import dxmi_tpu.ops.attn_block as ab
    if not ab._tpu_backend():
        assert not fused_attn_available(1024, 384, 6)  # CPU: einsum path


def test_gate_weight_cap_env(monkeypatch):
    """DXMI_FUSED_VMEM_C parametrizes the CxC-weight VMEM bound the way
    DXMI_FUSED_VMEM_SC does the activation bound (r5: the int8 kernel's
    weights are half-size, so C=1024 — LSUN's 16^2/8^2 maps — is
    admissible there; measured on chip, PERF.md r5)."""
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    assert not fused_attn_available(256, 1024, 16)   # fp default cap 768
    assert fused_attn_available(256, 1024, 16, int8=True)   # i8 cap 1024
    monkeypatch.setenv("DXMI_FUSED_VMEM_C", "1024")
    assert fused_attn_available(256, 1024, 16)       # LSUN 16^2 map
    assert fused_attn_available(64, 1024, 16)        # LSUN 8^2 map
    assert not fused_attn_available(1024, 1024, 16)  # still SC-bounded
    monkeypatch.setenv("DXMI_FUSED_VMEM_C", "512")
    assert not fused_attn_available(256, 768, 12)    # lowers BOTH paths
    assert not fused_attn_available(256, 768, 12, int8=True)


def test_fused_int8_lsun_c1024_shapes():
    """int8 kernel exactness at the LSUN-256 C=1024 maps the raised
    weight cap admits (S=256 nh=16 and S=64 nh=16).  Tolerance is the
    measured fp32-epilogue class at C=1024 reductions: mean-rel ~2e-6
    with isolated ~2e-3 outliers (0.2% of elements) — far inside the
    W8A8 drift gates."""
    from dxmi_tpu.ops.attn_block import (attn_block_int8_reference,
                                         fused_attn_block_int8)

    for S in (256, 64):
        args = _mk(B=1, S=S, C=1024, nh=16, seed=11)
        sa_q = jnp.full((1024,), 0.03, jnp.float32)
        sa_p = jnp.full((1024,), 0.02, jnp.float32)
        ref = np.asarray(attn_block_int8_reference(*args, sa_q, sa_p,
                                                   num_heads=16))
        out = np.asarray(fused_attn_block_int8(*args, sa_q, sa_p,
                                               num_heads=16,
                                               interpret=True))
        mrel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
        assert np.abs(out - ref).max() < 5e-3, (S, np.abs(out - ref).max())
        assert mrel < 1e-4, (S, mrel)


def test_fused_matches_reference_fp32():
    args = _mk()
    ref = attn_block_reference(*args, num_heads=2)
    out = fused_attn_block(*args, num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_reference_lsun_ds8_shape():
    """Exactness at the LSUN-256 ds8 map (S=1024, C=512, nh=8) — the
    shape the r5 VMEM-gate raise newly admits to the fused kernel
    (19.94 vs 19.47 img/s at the record point, PERF.md r5)."""
    args = _mk(B=1, S=1024, C=512, nh=8, seed=7)
    ref = attn_block_reference(*args, num_heads=8)
    out = fused_attn_block(*args, num_heads=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_fused_matches_reference_bf16():
    args = _mk(dtype=jnp.bfloat16, seed=1)
    ref = attn_block_reference(*args, num_heads=2)
    out = fused_attn_block(*args, num_heads=2, interpret=True)
    err = (np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
           .mean() / (np.abs(np.asarray(ref, np.float32)).mean() + 1e-8))
    assert err < 2e-2, err


def test_fused_grad_via_reference():
    args = _mk(S=128, C=64, nh=1, seed=2)
    # S=128 fails the availability gate but the kernel itself still runs;
    # grad correctness is what's under test here
    def loss_f(fn):
        def f(*a):
            return jnp.sum(fn(*a) ** 2)
        return f

    g_ref = jax.grad(loss_f(lambda *a: attn_block_reference(*a, num_heads=1)),
                     argnums=(0, 1, 3))(*args)
    g_fus = jax.grad(loss_f(lambda *a: fused_attn_block(*a, num_heads=1,
                                                        interpret=True)),
                     argnums=(0, 1, 3))(*args)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_unet_small_attn_fused_param_tree_and_numerics(monkeypatch):
    """UNetSmall's single-head AttnBlock (d=C=256, eps=1e-6) under
    attn_impl='fused': same param tree as the einsum path and matching
    numerics (separate q/k/v conv weights concatenated into the kernel's
    qkv plane layout)."""
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    from dxmi_tpu.models.unet_small import AttnBlock

    B, H, W, C = 2, 16, 16, 256                 # the CIFAR attention map
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    ein = AttnBlock(attn_impl="einsum")
    fus = AttnBlock(attn_impl="fused")
    p = ein.init(jax.random.key(1), x)["params"]
    p_f = fus.init(jax.random.key(1), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(p_f)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_f)):
        assert a.shape == b.shape

    out_e = ein.apply({"params": p}, x)
    out_f = fus.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)


def test_attention_block_adm_fused_param_tree_and_numerics(monkeypatch):
    """attn_impl='fused' must keep the exact nn.Conv/GroupNorm param tree
    (checkpoint compatibility) and match the einsum path numerically."""
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    from dxmi_tpu.models.unet_adm import AttentionBlockADM

    B, H, W, C, nh = 2, 16, 16, 128, 2          # S=256 passes the gate
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    ein = AttentionBlockADM(num_heads=nh, attn_impl="einsum")
    fus = AttentionBlockADM(num_heads=nh, attn_impl="fused")
    p = ein.init(jax.random.key(1), x)["params"]
    p_f = fus.init(jax.random.key(1), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(p_f)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_f)):
        assert a.shape == b.shape

    # proj_out is zero-init -> block is identity at init; perturb
    p = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(2), a.shape),
        p)
    out_e = ein.apply({"params": p}, x)
    out_f = fus.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)


def test_unet_small_einsum_merged_exact():
    """attn_impl='einsum_merged' runs q/k/v as one (C,3C) matmul built from
    the UNCHANGED per-conv params: identical param tree and bitwise-equal
    outputs vs the reference einsum path (unet_small.py AttnBlock)."""
    from dxmi_tpu.models.unet_small import UNetSmall

    for dt in (jnp.float32, jnp.bfloat16):
        a = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), dropout=0.0, in_channels=3,
                      resolution=16, dtype=dt)
        b = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), dropout=0.0, in_channels=3,
                      resolution=16, dtype=dt, attn_impl="einsum_merged")
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        t = jnp.array([3, 7])
        pa = a.init(jax.random.key(1), x, t)
        pb = b.init(jax.random.key(1), x, t)
        assert jax.tree.structure(pa) == jax.tree.structure(pb)
        ya = np.asarray(a.apply(pa, x, t), np.float32)
        yb = np.asarray(b.apply(pa, x, t), np.float32)
        np.testing.assert_array_equal(ya, yb)


def test_unet_small_einsum_folded_close():
    """attn_impl='einsum_folded' folds the v conv + proj_out into one (C,C)
    matmul using softmax-rows-sum-to-1 and the logit scale into Wq —
    mathematically exact, so it matches the einsum path to fp rounding
    (tight in fp32, bf16-class in bf16). Param tree unchanged."""
    from dxmi_tpu.models.unet_small import UNetSmall

    for dt, rtol, atol in ((jnp.float32, 2e-5, 2e-5),
                           (jnp.bfloat16, 3e-2, 3e-2)):
        a = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), dropout=0.0, in_channels=3,
                      resolution=16, dtype=dt)
        b = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), dropout=0.0, in_channels=3,
                      resolution=16, dtype=dt, attn_impl="einsum_folded")
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        t = jnp.array([3, 7])
        pa = a.init(jax.random.key(1), x, t)
        pb = b.init(jax.random.key(1), x, t)
        assert jax.tree.structure(pa) == jax.tree.structure(pb)
        # proj_out may be zero-init -> the v fold would vanish; perturb so
        # the folded path is actually exercised
        pa = jax.tree.map(
            lambda a_: a_ + 0.02 * jax.random.normal(jax.random.key(2),
                                                     a_.shape), pa)
        ya = np.asarray(a.apply(pa, x, t), np.float32)
        yb = np.asarray(b.apply(pa, x, t), np.float32)
        np.testing.assert_allclose(ya, yb, rtol=rtol, atol=atol)


def test_unet_small_einsum_merged_int8_matches_split():
    """Under quant='static', attn_impl='einsum_merged' runs q/k/v as ONE
    W8A8 int8 (C,3C) matmul with a shared per-input-channel act_scale.
    Since split int8 QConvs see the same input (=> calibrate the same
    scales) and weight quantization is per-output-channel either way, the
    merged path must match the split path to fp-rounding."""
    from dxmi_tpu.models.unet_small import UNetSmall

    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), dropout=0.0, in_channels=3,
              resolution=16, dtype=jnp.float32, quant_int8="static",
              quant_skip_attn=False)
    a = UNetSmall(**kw)                               # split QConv q/k/v
    b = UNetSmall(**kw, attn_impl="einsum_merged")    # one int8 matmul
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([3, 7])
    va = a.init(jax.random.key(1), x, t)
    vb = b.init(jax.random.key(1), x, t)
    assert jax.tree.structure(va["params"]) == jax.tree.structure(
        vb["params"])
    # calibration pass (records act scales; forward stays full precision)
    ya_cal, va_mut = a.apply({"params": va["params"]}, x, t,
                             mutable=["quant_scales"])
    yb_cal, vb_mut = b.apply({"params": va["params"]}, x, t,
                             mutable=["quant_scales"])
    np.testing.assert_allclose(np.asarray(ya_cal), np.asarray(yb_cal),
                               rtol=1e-5, atol=1e-5)
    # int8 inference: identical math modulo fp reassociation
    ya = a.apply({"params": va["params"], **va_mut}, x, t)
    yb = b.apply({"params": va["params"], **vb_mut}, x, t)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)


def test_unet_small_softmax_nomax_close():
    """exp(l)/sum(exp(l)) without the max shift is the identical function
    in exact arithmetic; fp32 drift is rounding-class (the logit scale
    C^-0.5 keeps |l| far from exp overflow)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxmi_tpu.models.unet_small import UNetSmall

    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8, 16), dropout=0.0, in_channels=3,
              resolution=16, dtype=jnp.float32)
    net_a = UNetSmall(**kw)
    net_b = UNetSmall(**kw, softmax_nomax=True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([1, 5])
    params = net_a.init(jax.random.key(1), x, t)["params"]
    ya = np.asarray(net_a.apply({"params": params}, x, t))
    yb = np.asarray(net_b.apply({"params": params}, x, t))
    np.testing.assert_allclose(yb, ya, rtol=1e-4, atol=1e-5)


def test_fused_batch_blocked_matches_per_element():
    """_kernel_bb (block_b>1) must agree with the recorded per-element
    kernel and the reference, including a non-dividing block_b (B=6,
    bb=4 -> falls back to bb=2) and nh>1 head slicing."""
    args = _mk(B=6, S=128, C=128, nh=2, seed=3)
    ref = attn_block_reference(*args, num_heads=2)
    for bb in (2, 3, 4):
        out = fused_attn_block(*args, num_heads=2, interpret=True,
                               block_b=bb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_batch_blocked_bf16_single_head():
    """block_b path at the CIFAR bench shape class (nh=1, bf16)."""
    args = _mk(B=4, S=256, C=128, nh=1, dtype=jnp.bfloat16, seed=4)
    ref = attn_block_reference(*args, num_heads=1)
    out = fused_attn_block(*args, num_heads=1, interpret=True, block_b=4)
    err = (np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
           .mean() / (np.abs(np.asarray(ref, np.float32)).mean() + 1e-8))
    assert err < 2e-2, err


# ---------------------------------------------------------------------------
# int8-native fused block (W8A8 qkv/proj epilogues in-kernel)


def test_fused_int8_kernel_matches_int8_reference():
    """_kernel_i8 (interpret) vs attn_block_int8_reference: the same
    quantization math (per-input-channel act scales folded into the
    weights, per-output-channel symmetric int8, int32 accumulation) must
    agree to fp32 epilogue rounding."""
    from dxmi_tpu.ops.attn_block import (attn_block_int8_reference,
                                         fused_attn_block_int8)

    x, gs, gb, wq, bq, wp, bp = _mk(seed=3)
    # realistic calibrated scales: channel amax / 127 of the actual
    # post-GN / post-attention activations
    ref_fp = attn_block_reference(x, gs, gb, wq, bq, wp, bp, num_heads=2)
    sa_q = jnp.full((x.shape[-1],), 0.03, jnp.float32)
    sa_p = jnp.full((x.shape[-1],), 0.02, jnp.float32)
    ref = attn_block_int8_reference(x, gs, gb, wq, bq, wp, bp, sa_q, sa_p,
                                    num_heads=2)
    out = fused_attn_block_int8(x, gs, gb, wq, bq, wp, bp, sa_q, sa_p,
                                num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # and int8 vs fp drift stays in the expected W8A8 class (<2% rel)
    rel = (np.abs(np.asarray(out) - np.asarray(ref_fp)).mean()
           / (np.abs(np.asarray(ref_fp)).mean() + 1e-8))
    assert rel < 2e-2, rel


def test_fused_int8_bf16_class():
    from dxmi_tpu.ops.attn_block import (attn_block_int8_reference,
                                         fused_attn_block_int8)

    x, gs, gb, wq, bq, wp, bp = _mk(dtype=jnp.bfloat16, seed=4)
    sa_q = jnp.full((x.shape[-1],), 0.03, jnp.float32)
    sa_p = jnp.full((x.shape[-1],), 0.02, jnp.float32)
    ref = attn_block_int8_reference(x, gs, gb, wq, bq, wp, bp, sa_q, sa_p,
                                    num_heads=2)
    out = fused_attn_block_int8(x, gs, gb, wq, bq, wp, bp, sa_q, sa_p,
                                num_heads=2, interpret=True)
    err = (np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
           .mean() / (np.abs(np.asarray(ref, np.float32)).mean() + 1e-8))
    assert err < 2e-2, err


def test_adm_attention_quant_static_calibrate_and_apply(monkeypatch):
    """AttentionBlockADM(quant='static', attn_impl='fused'): calibration
    records per-channel scales in 'quant_scales'; the int8 apply then
    matches the einsum fp path within W8A8 drift."""
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    from dxmi_tpu.models.unet_adm import AttentionBlockADM

    B, H, W, C, nh = 2, 16, 16, 128, 2
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    blk = AttentionBlockADM(num_heads=nh, attn_impl="fused", quant="static")
    variables = blk.init(jax.random.key(1), x)
    p = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(2), a.shape),
        variables["params"])

    # calibration pass: mutable quant_scales, full-precision forward
    out_cal, upd = blk.apply({"params": p,
                              "quant_scales": variables["quant_scales"]},
                             x, mutable=["quant_scales"])
    scales = upd["quant_scales"]
    assert float(jnp.max(scales["attn_act_scale"])) > 0
    assert float(jnp.max(scales["attn_proj_scale"])) > 0

    ein = AttentionBlockADM(num_heads=nh, attn_impl="einsum")
    out_fp = ein.apply({"params": p}, x)
    # calibration forward IS the fp path
    np.testing.assert_allclose(np.asarray(out_cal), np.asarray(out_fp),
                               rtol=2e-4, atol=2e-4)

    out_i8 = blk.apply({"params": p, "quant_scales": scales}, x)
    rel = (np.abs(np.asarray(out_i8) - np.asarray(out_fp)).mean()
           / (np.abs(np.asarray(out_fp)).mean() + 1e-8))
    assert 0 < rel < 2e-2, rel


def test_fused_nomax_close(monkeypatch):
    """DXMI_FUSED_NOMAX=1 (max-subtract pass dropped) stays within fp32
    rounding of the standard softmax path — exact math, not an
    approximation."""
    from dxmi_tpu.ops import attn_block as ab

    args = _mk(seed=5)
    base = ab.fused_attn_block(*args, num_heads=2, interpret=True)
    monkeypatch.setenv("DXMI_FUSED_NOMAX", "1")
    out = ab.fused_attn_block(*args, num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_nomax_clip_guards_extreme_logits(monkeypatch):
    """ADVICE r4: the nomax branch clips logits to (-80, 80) so rows whose
    fp32 logits would all underflow (0/0 = NaN) or overflow exp() stay
    finite — the regime a divergent/untrained checkpoint can produce,
    where standard softmax is safe."""
    from dxmi_tpu.ops.attn_block import _softmax_rows

    lg = jnp.array([[-200.0, -150.0, -180.0],   # all-underflow row
                    [95.0, 100.0, 90.0],        # overflow row
                    [0.5, -0.3, 0.1]])          # sane row
    w = _softmax_rows(lg, nomax=True)
    assert np.all(np.isfinite(np.asarray(w)))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-6)
    # sane rows are bit-identical to the unclipped formulation
    ref = jnp.exp(lg[2]) / jnp.sum(jnp.exp(lg[2]))
    np.testing.assert_array_equal(np.asarray(w[2]), np.asarray(ref))


def test_int8_uncalibrated_scales_finite():
    """ADVICE r4: zeros((C,)) quant scales (a checkpoint saved without
    the 'quant_scales' collection) must not produce inf/NaN — the scale
    floor in _prep_int8_mats matches calib_channel_scale's."""
    from dxmi_tpu.ops.attn_block import fused_attn_block_int8

    x, gs, gb, wq, bq, wp, bp = _mk(seed=6)
    z = jnp.zeros((x.shape[-1],), jnp.float32)
    out = fused_attn_block_int8(x, gs, gb, wq, bq, wp, bp, z, z,
                                num_heads=2, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))


def _grads_of(fn, args, nh):
    def loss(*a):
        out = fn(*a, num_heads=nh)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                                     .reshape(out.shape)))
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


def test_fused_train_bwd_matches_reference_grads():
    """The pallas backward kernel (fused_attn_block_train) vs jax.grad of
    the pure-JAX reference: every cotangent (dx, dgs, dgb, dwqkv, dbqkv,
    dwp, dbp), fp32, multi-head, multi-tile (S > qb via _bwd_qb)."""
    from dxmi_tpu.ops.attn_block import (attn_block_reference,
                                         fused_attn_block_train)

    args = _mk(B=2, S=256, C=128, nh=2, seed=7)
    g_ref = _grads_of(
        lambda *a, num_heads: attn_block_reference(*a, num_heads=num_heads),
        args, nh=2)
    g_fused = _grads_of(
        lambda *a, num_heads: fused_attn_block_train(
            *a, num_heads=num_heads, interpret=True),
        args, nh=2)
    names = ["dx", "dgs", "dgb", "dwqkv", "dbqkv", "dwp", "dbp"]
    for n, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=n)


def test_fused_train_bwd_bf16_class():
    """bf16 inputs: gradient drift vs the fp32 reference stays in the
    bf16 class (the training compute dtype)."""
    from dxmi_tpu.ops.attn_block import (attn_block_reference,
                                         fused_attn_block_train)

    args32 = _mk(B=2, S=128, C=64, nh=1, seed=8)
    args16 = tuple(a.astype(jnp.bfloat16) if a.ndim == 3 else a
                   for a in args32)
    g_ref = _grads_of(
        lambda *a, num_heads: attn_block_reference(*a, num_heads=num_heads),
        args32, nh=1)
    g_fused = _grads_of(
        lambda *a, num_heads: fused_attn_block_train(
            *a, num_heads=num_heads, interpret=True),
        args16, nh=1)
    for n, a, b in zip(["dx", "dgs", "dgb", "dwqkv", "dbqkv", "dwp", "dbp"],
                       g_fused, g_ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8)
        assert rel < 3e-2, (n, rel)


def test_fused_train_fwd_identical_to_sampling_fwd():
    """The train op's forward IS the sampling kernel (same _pallas_forward)
    — bit-identical outputs."""
    from dxmi_tpu.ops.attn_block import (fused_attn_block,
                                         fused_attn_block_train)

    args = _mk(seed=9)
    a = fused_attn_block(*args, num_heads=2, interpret=True)
    b = fused_attn_block_train(*args, num_heads=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_block_adm_fused_train_grads(monkeypatch):
    """attn_impl='fused_train' (the pallas-backward training path): same
    param tree as einsum AND matching parameter/input gradients through
    AttentionBlockADM.apply."""
    monkeypatch.setenv("DXMI_FUSED_ATTN_FORCE", "1")
    from dxmi_tpu.models.unet_adm import AttentionBlockADM

    B, H, W, C, nh = 2, 16, 16, 128, 2          # S=256 passes both gates
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    ein = AttentionBlockADM(num_heads=nh, attn_impl="einsum")
    fus = AttentionBlockADM(num_heads=nh, attn_impl="fused_train")
    p = ein.init(jax.random.key(1), x)["params"]
    assert (jax.tree.structure(p)
            == jax.tree.structure(fus.init(jax.random.key(1), x)["params"]))
    p = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(2), a.shape),
        p)

    def loss(mod, p, x):
        out = mod.apply({"params": p}, x)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     .reshape(out.shape)))

    ge_p, ge_x = jax.grad(functools.partial(loss, ein),
                          argnums=(0, 1))(p, x)
    gf_p, gf_x = jax.grad(functools.partial(loss, fus),
                          argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(ge_x),
                               rtol=1e-3, atol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        gf_p, ge_p)


def test_fused_avt_variants_match(monkeypatch):
    """DXMI_FUSED_AVT=1/2 (transposed-AV formulations, PERF.md r5 MXU
    probe) match the row formulation to fp32 rounding, fp and int8
    kernels, with and without nomax."""
    from dxmi_tpu.ops import attn_block as ab

    args = _mk(seed=10)
    sa_q = jnp.full((args[0].shape[-1],), 0.03, jnp.float32)
    sa_p = jnp.full((args[0].shape[-1],), 0.02, jnp.float32)
    base = ab.fused_attn_block(*args, num_heads=2, interpret=True)
    base_i8 = ab.fused_attn_block_int8(*args, sa_q, sa_p, num_heads=2,
                                       interpret=True)
    for avtv in ["1", "2"]:
        for nomax in [None, "1"]:
            monkeypatch.setenv("DXMI_FUSED_AVT", avtv)
            if nomax:
                monkeypatch.setenv("DXMI_FUSED_NOMAX", nomax)
            else:
                monkeypatch.delenv("DXMI_FUSED_NOMAX", raising=False)
            out = ab.fused_attn_block(*args, num_heads=2, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(base), rtol=3e-5, atol=3e-5,
                err_msg=f"fp avt={avtv} nomax={nomax}")
            out8 = ab.fused_attn_block_int8(*args, sa_q, sa_p, num_heads=2,
                                            interpret=True)
            np.testing.assert_allclose(
                np.asarray(out8), np.asarray(base_i8), rtol=3e-5, atol=3e-5,
                err_msg=f"i8 avt={avtv} nomax={nomax}")
