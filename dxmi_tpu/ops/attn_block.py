"""Fused ADM attention block — GN(32) + qkv 1x1 + MHA + proj 1x1 +
residual as ONE Pallas TPU kernel (forward path).

Reference semantics: cm/unet.py:263-378 (AttentionBlock: GroupNorm32 ->
qkv 1x1 conv -> QKVAttentionLegacy with scale = 1/sqrt(sqrt(d)) applied
to BOTH q and k, fp32 softmax -> zero-init proj 1x1 -> residual add).

Why fuse: the XLA path executes the block as ~8 HBM round-trips (GN
read/write, qkv conv read/write, the BNSD transposes the flash kernel
needs for q/k/v, attention out, proj read/write, residual) and at the
ImageNet64/LSUN map shapes every one of those tensors is (S, C)…(S, 3C)
— the block is bandwidth-bound, not FLOP-bound (PERF.md: post-flash
decomposition shows the blocks cost ~30% of the step with the flash core
already optimal; the remainder IS this traffic).  The fused kernel reads
x once and writes the residual sum once; everything between lives in
VMEM.

Design notes (TPU):
- grid = (B,): one program per batch element; at the gated shapes the
  whole working set (x, h, q/k/v, per-tile logits, out, weights) fits
  the ~16 MB VMEM budget.
- GroupNorm stats via two mask matmuls on the MXU: ``x @ M`` with
  ``M[c, g] = 1/(S*C_g)`` gives per-group sums without any reshape to a
  (S, G, C/G) layout (whose trailing dim C/G=12 would fight the 128-lane
  tiling); the (1, G) stats broadcast back to channels through a one-hot
  expansion matmul.  Extra FLOPs: 2*S*C*G ≈ 0.3% of the qkv matmul.
- logits are computed in q-row tiles of 256 so the fp32 score tile stays
  (256, S) ≤ 1 MB; softmax is row-local so tiling is exact, not an
  online approximation.
- softmax in fp32 (reference parity), q/k/v matmuls accumulate fp32 on
  the MXU and carry bf16 between ops — same numerics class as the flash
  path (measured 0.3% rel. drift = bf16 noise, PERF.md).

Backward: ``fused_attn_block`` carries a ``jax.custom_vjp`` whose
backward recomputes the block with the pure-JAX reference implementation
(``attn_block_reference``) and differentiates that — so the op is safe
to use anywhere, while training paths keep the flash kernel's fused
backward by default (kernel-policy note in PERF.md).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fused_attn_available(seq_len: int, channels: int, num_heads: int,
                         int8: bool = False) -> bool:
    """Gate: shapes where the fused kernel is correct AND measured to fit.

    - S a multiple of 64 (q-row tiles + sublane tiling); S=64 (the ds8
      maps, 8 blocks on ImageNet64) measured +1.4% on top of the big-map
      win (scripts/bench_fused_s64.py),
    - head_dim <= 256 and C % num_heads == 0 (the kernel's per-head
      matmuls are plain dot_generals, so d is VMEM-bounded, not
      lane-bounded; d=256 is the single-head CIFAR S=256 C=256 map),
    - working set bounds: S*C <= 1024*512 (activations) and C <= 768
      (the four CxC weight mats alone are 8 MB at C=1024) keep the
      program inside the ~16 MB VMEM budget; covers the ImageNet64
      ds2/ds4 maps and (round 5) the LSUN-256 ds8 map (S=1024, C=512),
      where the int8 kernel beat the einsum path 19.94 vs 19.47 img/s
      at the record operating point (PERF.md r5 LSUN decomposition).
    - ``int8=True`` (the W8A8 kernel, whose weight mats are half-size)
      raises the weight bound to C <= 1024, admitting LSUN-256's
      16^2/8^2 maps (S=256/64, C=1024, nh=16): measured 20.18 vs 19.94
      img/s at the record point (PERF.md r5, second gate raise).
    """
    if channels % num_heads:
        return False
    if not (_tpu_backend()
            or os.environ.get("DXMI_FUSED_ATTN_FORCE") == "1"):
        # off-TPU the kernel only exists in interpret mode (tests force
        # it; production CPU paths take the einsum fallback)
        return False
    d = channels // num_heads
    # DXMI_FUSED_VMEM_SC raises/lowers the activation working-set bound
    # (trace-time, like DXMI_GN_STATS).  1024*384 was the r1-r4 bound
    # (the measured bb=1 ImageNet64 envelope); r5 measured the LSUN ds8
    # map (S*C=524288) fits AND wins (+2.4% at the record point), so the
    # default admits it.
    sc_cap = int(os.environ.get("DXMI_FUSED_VMEM_SC", str(1024 * 512)))
    # DXMI_FUSED_VMEM_C parametrizes the weight-mat bound the same way
    # (the four CxC mats are 8 MB bf16 at C=1024; the int8 kernel's are
    # half that, so its default admits C=1024 — LSUN's 16^2/8^2 maps).
    c_cap = int(os.environ.get("DXMI_FUSED_VMEM_C",
                               "1024" if int8 else "768"))
    return (seq_len >= 64 and seq_len % 64 == 0 and d <= 256
            and channels <= c_cap and seq_len * channels <= sc_cap)


def _softmax_rows(lg, nomax: bool):
    """Row softmax over fp32 logits; ``nomax`` drops the max-subtract
    pass (exact math: the shift is a no-op and the scaled logits sit
    orders below fp32 exp overflow — the UNetSmall softmax_nomax
    argument, PERF.md r3, applied in-kernel).

    The clip bounds exp() away from overflow (lg > ~88 -> inf) and the
    all-underflow 0/0 row (every lg < ~-103), which standard softmax is
    immune to but a divergent/untrained checkpoint could hit; within
    (-80, 80) — everything any tested fixture produces — the clip is the
    identity, preserving the exact-math property (ADVICE r4)."""
    if nomax:
        e = jnp.exp(jnp.clip(lg, -80.0, 80.0))
        return e / jnp.sum(e, axis=-1, keepdims=True)
    return jax.nn.softmax(lg, axis=-1)


def _softmax_cols(lg, nomax: bool):
    """Column softmax (axis 0) for the TRANSPOSED-logits formulation —
    same math as :func:`_softmax_rows` on lg.T, with the reductions
    running down sublanes instead of across lanes."""
    if nomax:
        e = jnp.exp(jnp.clip(lg, -80.0, 80.0))
        return e / jnp.sum(e, axis=0, keepdims=True)
    m = jnp.max(lg, axis=0, keepdims=True)
    e = jnp.exp(lg - m)
    return e / jnp.sum(e, axis=0, keepdims=True)


def _attn_core(q, k, v, nh: int, qb: int, nomax: bool, avt: int):
    """Multi-head attention core shared by the fused kernels.  q and k
    arrive pre-scaled (each by d**-1/4), all (S, C); returns a (S, C).

    ``avt`` selects the AV-matmul formulation (PERF.md r5 MXU probe —
    scripts/bench_mxu_k64.py):
      0: row path — w (qb, S) @ v (S, d).  The (…, d=64) output pads the
         MXU's 128 output lanes: measured SLOWER than the same MACs at
         N=128, and 2.6x slower than the transposed form.
      1: transposed — logits computed as lgT (S, qb) = k q_tile^T (same
         K=d contraction cost), column softmax, aT (d, qb) = v^T wT with
         the contraction over S on full lanes and d on the un-quantized
         M dimension; one (C, S) -> (S, C) transpose at the end.
      2: like 1 but v^T materialized once per head and the AV as a
         canonical NN dot.
    """
    S, C = q.shape
    d = C // nh
    dt = q.dtype
    if avt == 0:
        heads = []
        for i in range(nh):
            qh = q[:, i * d:(i + 1) * d]
            kh = k[:, i * d:(i + 1) * d]
            vh = v[:, i * d:(i + 1) * d]
            tiles = []
            for r0 in range(0, S, qb):
                lg = jax.lax.dot_general(
                    qh[r0:r0 + qb], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (qb, S) fp32
                w = _softmax_rows(lg, nomax).astype(dt)
                tiles.append(jnp.dot(w, vh,
                                     preferred_element_type=jnp.float32)
                             .astype(dt))
            heads.append(jnp.concatenate(tiles, axis=0) if len(tiles) > 1
                         else tiles[0])
        return jnp.concatenate(heads, axis=1) if nh > 1 else heads[0]

    headsT = []
    for i in range(nh):
        qh = q[:, i * d:(i + 1) * d]
        kh = k[:, i * d:(i + 1) * d]
        vh = v[:, i * d:(i + 1) * d]
        vT = vh.T if avt == 2 else None
        tiles = []
        for r0 in range(0, S, qb):
            lgT = jax.lax.dot_general(
                kh, qh[r0:r0 + qb], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S, qb) fp32
            wT = _softmax_cols(lgT, nomax).astype(dt)
            if avt == 2:
                tiles.append(jnp.dot(vT, wT,
                                     preferred_element_type=jnp.float32)
                             .astype(dt))                    # (d, qb)
            else:
                tiles.append(jax.lax.dot_general(
                    vh, wT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt))
        headsT.append(jnp.concatenate(tiles, axis=1) if len(tiles) > 1
                      else tiles[0])                         # (d, S)
    aT = jnp.concatenate(headsT, axis=0) if nh > 1 else headsT[0]
    return aT.T                                              # (S, C)


def attn_block_reference(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
                         num_heads: int, eps: float = 1e-5):
    """Pure-JAX reference of the fused block (same math as
    AttentionBlockADM's einsum path with fp32 softmax). x: (B, S, C)."""
    B, S, C = x.shape
    nh = num_heads
    d = C // nh
    xf = x.astype(jnp.float32)
    g = xf.reshape(B, S, 32, C // 32)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    h = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, S, C)
    h = (h * gn_scale + gn_bias).astype(x.dtype)
    qkv = (jnp.einsum("bsc,cf->bsf", h, w_qkv.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           .astype(x.dtype) + b_qkv.astype(x.dtype))
    qkv = qkv.reshape(B, S, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, S, C)
    y = (jnp.einsum("bsc,cf->bsf", a, w_proj.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         .astype(x.dtype) + b_proj.astype(x.dtype))
    return x + y


def _kernel(x_ref, gs_ref, gb_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
            bv_ref, wp_ref, bp_ref, m_ref, e_ref, o_ref, *, nh: int,
            eps: float, qb: int, nomax: bool = False, avt: int = 0):
    x = x_ref[0]                                    # (S, C)
    S, C = x.shape
    d = C // nh
    dt = x.dtype
    xf = x.astype(jnp.float32)

    # GroupNorm(32) stats, fp32, via mask matmuls (see module docstring)
    sums = jnp.dot(xf, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums, axis=0, keepdims=True)            # (1, G)
    sq = jnp.dot(xf * xf, m_ref[:], preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq, axis=0, keepdims=True) - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, e_ref[:], preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, e_ref[:], preferred_element_type=jnp.float32)
    s_c = gs_ref[:] * inv_c                                  # (1, C) fp32
    t_c = gb_ref[:] - mean_c * s_c
    h = (xf * s_c + t_c).astype(dt)

    q = (jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32)
         .astype(dt) + bq_ref[:].astype(dt))
    k = (jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32)
         .astype(dt) + bk_ref[:].astype(dt))
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         .astype(dt) + bv_ref[:].astype(dt))

    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dt)
    a = _attn_core(q * scale, k * scale, v, nh, qb, nomax, avt)  # (S, C)

    y = (jnp.dot(a, wp_ref[:], preferred_element_type=jnp.float32)
         .astype(dt) + bp_ref[:].astype(dt))
    o_ref[0] = x + y


def _kernel_bb(x_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
               m_ref, e_ref, o_ref, *, nh: int, eps: float, qb: int,
               bb: int, nomax: bool = False):
    """Batch-blocked variant: one program normalizes and projects BB batch
    elements at once, so the qkv/proj matmuls run at (BB*S, C) rows — MXU
    utilization the per-element kernel (grid=(B,)) never reaches at the
    CIFAR map shape (S=256, C=256; PERF.md round-2: per-element fused lost
    6% to the XLA einsum path there).  Attention itself stays per-element
    (independent (S,S) logits), statically unrolled over BB."""
    x = x_ref[:]                                    # (BB, S, C)
    _, S, C = x.shape
    G = m_ref.shape[1]
    d = C // nh
    dt = x.dtype
    xf = x.astype(jnp.float32)
    flat = xf.reshape(bb * S, C)

    # per-element GroupNorm stats via mask matmuls (see module docstring)
    sums = jnp.dot(flat, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums.reshape(bb, S, G), axis=1)          # (BB, G)
    sq = jnp.dot(flat * flat, m_ref[:], preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq.reshape(bb, S, G), axis=1) - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, e_ref[:], preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, e_ref[:], preferred_element_type=jnp.float32)
    s_c = gs_ref[:] * inv_c                                   # (BB, C)
    t_c = gb_ref[:] - mean_c * s_c
    h = (xf * s_c[:, None, :] + t_c[:, None, :]).astype(dt)

    qkv = (jnp.dot(h.reshape(bb * S, C), wqkv_ref[:],
                   preferred_element_type=jnp.float32).astype(dt)
           + bqkv_ref[:].astype(dt)).reshape(bb, S, 3 * C)

    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dt)
    outs = []
    for i in range(bb):
        heads = []
        for hh in range(nh):
            qh = qkv[i, :, hh * d:(hh + 1) * d] * scale
            kh = qkv[i, :, C + hh * d:C + (hh + 1) * d] * scale
            vh = qkv[i, :, 2 * C + hh * d:2 * C + (hh + 1) * d]
            tiles = []
            for r0 in range(0, S, qb):
                lg = jax.lax.dot_general(
                    qh[r0:r0 + qb], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                w = _softmax_rows(lg, nomax).astype(dt)
                tiles.append(jnp.dot(w, vh,
                                     preferred_element_type=jnp.float32)
                             .astype(dt))
            heads.append(jnp.concatenate(tiles, axis=0) if len(tiles) > 1
                         else tiles[0])
        outs.append(jnp.concatenate(heads, axis=1) if nh > 1 else heads[0])
    a = jnp.stack(outs)                                       # (BB, S, C)

    y = (jnp.dot(a.reshape(bb * S, C), wp_ref[:],
                 preferred_element_type=jnp.float32).astype(dt)
         + bp_ref[:].astype(dt))
    o_ref[:] = x + y.reshape(bb, S, C)


def attn_block_int8_reference(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj,
                              b_proj, sa_qkv, sa_proj, num_heads: int,
                              eps: float = 1e-5):
    """Pure-JAX reference of the int8 fused block: GN fp32 -> W8A8 qkv
    (``int8_matmul_static`` semantics: per-input-channel act scales fold
    into the weight's input axis, per-output-channel symmetric int8
    weights, int32 MXU accumulation) -> bf16-class attention -> W8A8
    proj -> residual.  The parity oracle for ``_kernel_i8``."""
    from dxmi_tpu.ops.quant import int8_matmul_static

    B, S, C = x.shape
    nh = num_heads
    d = C // nh
    xf = x.astype(jnp.float32)
    g = xf.reshape(B, S, 32, C // 32)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    h = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, S, C)
    h = (h * gn_scale + gn_bias).astype(x.dtype)
    qkv = int8_matmul_static(h, w_qkv, b_qkv, sa_qkv, out_dtype=x.dtype)
    qkv = qkv.reshape(B, S, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, S, C)
    y = int8_matmul_static(a, w_proj, b_proj, sa_proj, out_dtype=x.dtype)
    return x + y


def _kernel_i8(x_ref, gs_ref, gb_ref, wqkv_ref, swq_ref, isa_q_ref,
               bqkv_ref, wp_ref, swp_ref, isa_p_ref, bp_ref, m_ref, e_ref,
               o_ref, *, nh: int, eps: float, qb: int,
               nomax: bool = False, avt: int = 0):
    """int8-native fused block: the qkv/proj matmuls run int8 x int8 ->
    int32 on the MXU (2x the bf16 rate on v5e) with the quantize/dequant
    epilogues fused in-VMEM.  GN stats fp32, attention core bf16 — the
    measured-optimal split (PERF.md round-1/2: quantizing the attention
    core itself loses at every shape tested).

    Inputs: wqkv_ref (C, 3C) int8 (activation scales already folded into
    the input axis, weights per-output-channel symmetric — the
    ``int8_matmul_static`` preparation, done in-graph outside the
    kernel); swq_ref (1, 3C) fp32 per-output dequant scales; isa_q_ref
    (1, C) fp32 = 1/act_scale for the post-GN activation quantize.
    Same layout for the proj side."""
    x = x_ref[0]                                    # (S, C)
    S, C = x.shape
    d = C // nh
    dt = x.dtype
    xf = x.astype(jnp.float32)

    # GroupNorm(32) stats, fp32, via mask matmuls (see module docstring)
    sums = jnp.dot(xf, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums, axis=0, keepdims=True)            # (1, G)
    sq = jnp.dot(xf * xf, m_ref[:], preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq, axis=0, keepdims=True) - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, e_ref[:], preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, e_ref[:], preferred_element_type=jnp.float32)
    s_c = gs_ref[:] * inv_c                                  # (1, C) fp32
    t_c = gb_ref[:] - mean_c * s_c

    # quantize h straight out of the GN epilogue (never materialized fp)
    h_q = (xf * s_c + t_c) * isa_q_ref[:]
    h_i8 = jnp.clip(jnp.round(h_q), -127, 127).astype(jnp.int8)

    qkv = (jnp.dot(h_i8, wqkv_ref[:],
                   preferred_element_type=jnp.int32).astype(jnp.float32)
           * swq_ref[:] + bqkv_ref[:]).astype(dt)            # (S, 3C)

    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dt)
    a = _attn_core(qkv[:, :C] * scale, qkv[:, C:2 * C] * scale,
                   qkv[:, 2 * C:], nh, qb, nomax, avt)       # (S, C)

    a_i8 = jnp.clip(jnp.round(a.astype(jnp.float32) * isa_p_ref[:]),
                    -127, 127).astype(jnp.int8)
    y = (jnp.dot(a_i8, wp_ref[:],
                 preferred_element_type=jnp.int32).astype(jnp.float32)
         * swp_ref[:] + bp_ref[:]).astype(dt)
    o_ref[0] = x + y


def _kernel_bwd(x_ref, ct_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wp_ref,
                m_ref, e_ref, dx_ref, dgs_ref, dgb_ref, dwqkv_ref,
                dbqkv_ref, dwp_ref, dbp_ref, *, nh: int, eps: float,
                qb: int, nomax: bool):
    """Fused BACKWARD of the attention block (VERDICT r4 task 2): one
    program per batch element recomputes the forward intermediates in
    VMEM (flash-style recompute — nothing but x and the cotangent is
    read from HBM) and emits dx plus all parameter cotangents.

    Derivation (y = x + proj(attn(qkv(GN(x)))), per head with
    qs = q*s, ks = k*s, s = d**-1/4, lg = qs ks^T, w = softmax(lg),
    a = w v):
      da   = ct @ wp^T
      dv_h = w_h^T da_h                (accumulated over q-row tiles)
      dw_h = da_h v_h^T
      dlg  = w * (dw - rowsum(dw * w))  (exact softmax jacobian)
      dq_h = s * dlg ks ;  dk_h = s * dlg^T qs
      dh   = sum_h [dq_h|dk_h|dv_h] @ W_head^T ; weight grads h^T dq...
      GN backward in fp32 via the same mask-matmul group reductions as
      the forward stats.
    Parameter cotangents accumulate across the (sequential) TPU grid:
    program 0 initializes, later programs +=.
    """
    x = x_ref[0]                                    # (S, C)
    ct = ct_ref[0]
    S, C = x.shape
    d = C // nh
    dt = x.dtype
    xf = x.astype(jnp.float32)
    ctf = ct.astype(jnp.float32)

    # recompute GN (forward formulation: mask matmuls, fp32)
    sums = jnp.dot(xf, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums, axis=0, keepdims=True)            # (1, G)
    sq = jnp.dot(xf * xf, m_ref[:], preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq, axis=0, keepdims=True) - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, e_ref[:], preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, e_ref[:], preferred_element_type=jnp.float32)
    hp = (xf - mean_c) * inv_c                               # (S, C) fp32
    h = (hp * gs_ref[:] + gb_ref[:]).astype(dt)

    qkv = (jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
           .astype(dt) + bqkv_ref[:].astype(dt))     # (S, 3C)
    da = jax.lax.dot_general(ct, wp_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(dt)            # ct @ wp^T  (S, C)

    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dt)
    first = pl.program_id(0) == 0
    dh_acc = jnp.zeros((S, C), jnp.float32)
    for i in range(nh):
        qs = qkv[:, i * d:(i + 1) * d] * scale
        ks = qkv[:, C + i * d:C + (i + 1) * d] * scale
        vh = qkv[:, 2 * C + i * d:2 * C + (i + 1) * d]
        dah = da[:, i * d:(i + 1) * d]
        dv = jnp.zeros((S, d), jnp.float32)
        dk = jnp.zeros((S, d), jnp.float32)
        dwp_h = jnp.zeros((d, C), jnp.float32)
        dq_tiles = []
        for r0 in range(0, S, qb):
            lg = jax.lax.dot_general(
                qs[r0:r0 + qb], ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (qb, S)
            w = _softmax_rows(lg, nomax)                     # fp32
            wb = w.astype(dt)
            dat = dah[r0:r0 + qb]
            # a tile -> dwp rows for this head: (d, C) += a_t^T ct_t
            a_t = jnp.dot(wb, vh, preferred_element_type=jnp.float32
                          ).astype(dt)                       # (qb, d)
            dwp_h += jax.lax.dot_general(
                a_t, ct[r0:r0 + qb], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv += jax.lax.dot_general(
                wb, dat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S, d)
            dwt = jax.lax.dot_general(
                dat, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (qb, S)
            dlg = w * (dwt - jnp.sum(dwt * w, axis=-1, keepdims=True))
            dlgb = dlg.astype(dt)
            dq_tiles.append(
                jnp.dot(dlgb, ks, preferred_element_type=jnp.float32))
            dk += jax.lax.dot_general(
                dlgb, qs[r0:r0 + qb], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (S, d)
        dq = (jnp.concatenate(dq_tiles, axis=0) if len(dq_tiles) > 1
              else dq_tiles[0])
        sf = jnp.float32(1.0 / math.sqrt(math.sqrt(d)))
        dq = dq * sf
        dk = dk * sf
        # dh += dq @ Wq_h^T + dk @ Wk_h^T + dv @ Wv_h^T, and weight/bias
        # cotangents for this head's three weight column blocks
        for off, g in ((i * d, dq), (C + i * d, dk), (2 * C + i * d, dv)):
            gb_ = g.astype(dt)
            wslice = wqkv_ref[:, off:off + d]                # (C, d)
            dh_acc += jax.lax.dot_general(
                gb_, wslice, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwqkv_blk = jax.lax.dot_general(
                h, gb_, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (C, d)
            dbqkv_blk = jnp.sum(g, axis=0, keepdims=True)    # (1, d)

            @pl.when(first)
            def _():
                dwqkv_ref[:, off:off + d] = dwqkv_blk
                dbqkv_ref[:, off:off + d] = dbqkv_blk

            @pl.when(jnp.logical_not(first))
            def _():
                dwqkv_ref[:, off:off + d] += dwqkv_blk
                dbqkv_ref[:, off:off + d] += dbqkv_blk

        @pl.when(first)
        def _():
            dwp_ref[i * d:(i + 1) * d, :] = dwp_h

        @pl.when(jnp.logical_not(first))
        def _():
            dwp_ref[i * d:(i + 1) * d, :] += dwp_h

    dbp_b = jnp.sum(ctf, axis=0, keepdims=True)              # (1, C)
    dgs_b = jnp.sum(dh_acc * hp, axis=0, keepdims=True)
    dgb_b = jnp.sum(dh_acc, axis=0, keepdims=True)

    # GN backward (group means via the same mask matmuls)
    dhp = dh_acc * gs_ref[:]
    g1 = jnp.sum(jnp.dot(dhp, m_ref[:],
                         preferred_element_type=jnp.float32),
                 axis=0, keepdims=True)                      # (1, G) means
    g2 = jnp.sum(jnp.dot(dhp * hp, m_ref[:],
                         preferred_element_type=jnp.float32),
                 axis=0, keepdims=True)
    g1c = jnp.dot(g1, e_ref[:], preferred_element_type=jnp.float32)
    g2c = jnp.dot(g2, e_ref[:], preferred_element_type=jnp.float32)
    dx = ctf + inv_c * (dhp - g1c - hp * g2c)
    dx_ref[0] = dx.astype(dt)

    @pl.when(first)
    def _():
        dgs_ref[:] = dgs_b
        dgb_ref[:] = dgb_b
        dbp_ref[:] = dbp_b

    @pl.when(jnp.logical_not(first))
    def _():
        dgs_ref[:] += dgs_b
        dgb_ref[:] += dgb_b
        dbp_ref[:] += dbp_b


def _pallas_backward(x, ct, gn_scale, gn_bias, w_qkv, b_qkv, w_proj,
                     nh: int, eps: float, interpret: bool, nomax: bool):
    """Run ``_kernel_bwd`` over the batch grid; returns fp32 cotangents
    (dx in x.dtype) for (x, gs, gb, w_qkv, b_qkv, w_proj, b_proj)."""
    B, S, C = x.shape
    m, e = _group_mats(C, S)
    qb = min(S, _bwd_qb(S, C))
    vec = pl.BlockSpec((1, C), lambda b: (0, 0))
    outs = pl.pallas_call(
        functools.partial(_kernel_bwd, nh=nh, eps=eps, qb=qb, nomax=nomax),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            vec, vec,
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((C, 32), lambda b: (0, 0)),
            pl.BlockSpec((32, C), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            vec, vec,
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            vec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, ct,
      gn_scale.reshape(1, C).astype(jnp.float32),
      gn_bias.reshape(1, C).astype(jnp.float32),
      w_qkv.astype(x.dtype), b_qkv.reshape(1, 3 * C).astype(jnp.float32),
      w_proj.astype(x.dtype), m, e)
    return outs


def _bwd_qb(S: int, C: int) -> int:
    """q-row tile for the backward kernel: its VMEM working set carries
    ~4 fp32 (qb, S) score tiles plus the fp32 dh accumulator, so the
    tile shrinks at the big maps where the forward uses 256."""
    return 128 if S * C > 512 * 384 else 256


def fused_attn_bwd_available(seq_len: int, channels: int,
                             num_heads: int) -> bool:
    """Gate for the TRAINING (pallas-backward) fused block: forward gate
    plus the backward kernel's own VMEM headroom (fp32 accumulators for
    dh and the parameter cotangents live alongside the forward working
    set)."""
    return (fused_attn_available(seq_len, channels, num_heads)
            and seq_len * channels <= 1024 * 384)


@functools.lru_cache(maxsize=None)
def _make_op_train(nh: int, eps: float, interpret: bool,
                   nomax: bool = False, avt: int = 0):
    """fused forward + fused pallas BACKWARD (training path).  The
    reference-recompute bwd in ``_make_op`` stays the default for
    sampling-only callers (it is never invoked there)."""
    @jax.custom_vjp
    def op(x, gs, gb, wq, bq, wp, bp):
        return _pallas_forward(x, gs, gb, wq, bq, wp, bp, nh, eps,
                               interpret, 1, nomax, avt)

    def fwd(x, gs, gb, wq, bq, wp, bp):
        return op(x, gs, gb, wq, bq, wp, bp), (x, gs, gb, wq, bq, wp, bp)

    def bwd(res, ct):
        x, gs, gb, wq, bq, wp, bp = res
        dx, dgs, dgb, dwq, dbq, dwp, dbp = _pallas_backward(
            x, ct, gs, gb, wq, bq, wp, nh, eps, interpret, nomax)
        return (dx,
                dgs.reshape(gs.shape).astype(gs.dtype),
                dgb.reshape(gb.shape).astype(gb.dtype),
                dwq.astype(wq.dtype),
                dbq.reshape(bq.shape).astype(bq.dtype),
                dwp.astype(wp.dtype),
                dbp.reshape(bp.shape).astype(bp.dtype))

    op.defvjp(fwd, bwd)
    return op


def fused_attn_block_train(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj,
                           b_proj, num_heads: int, eps: float = 1e-5,
                           interpret: bool | None = None):
    """Fused attention block with a REAL fused backward (one Pallas
    kernel for dx + all parameter cotangents, flash-style in-VMEM
    recompute) — the training-path variant of :func:`fused_attn_block`
    (whose reference-recompute vjp keeps sampling callers safe).  Gate
    with :func:`fused_attn_bwd_available`.

    Reference training hot path this serves:
    train_image_large.py:248-269 + cm/unet.py:263-378."""
    if interpret is None:
        interpret = not _tpu_backend()
    nomax = os.environ.get("DXMI_FUSED_NOMAX") == "1"
    avt = int(os.environ.get("DXMI_FUSED_AVT", "0"))
    return _make_op_train(int(num_heads), float(eps), bool(interpret),
                          nomax, avt)(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj)


def _prep_int8_mats(w_qkv, w_proj, sa_qkv, sa_proj):
    """Fold act scales into the weights' input axes and quantize
    per-output-channel (the exact ``int8_matmul_static`` preparation) —
    in-graph, outside the kernel; XLA constant-folds it for baked params
    and it is a cheap elementwise pass over (C, 3C)/(C, C) otherwise."""
    from dxmi_tpu.ops.quant import quantize_per_channel

    C = w_qkv.shape[0]
    # floor matches calib_channel_scale's: an uncalibrated zeros((C,))
    # scale (checkpoint saved without 'quant_scales') would otherwise
    # produce 1/0 = inf here and silent NaN output (ADVICE r4)
    sa_q = jnp.maximum(jnp.asarray(sa_qkv, jnp.float32).reshape(C), 1e-8)
    sa_p = jnp.maximum(jnp.asarray(sa_proj, jnp.float32).reshape(C), 1e-8)
    wq_i8, swq = quantize_per_channel(
        w_qkv.astype(jnp.float32) * sa_q[:, None], axis=-1)
    wp_i8, swp = quantize_per_channel(
        w_proj.astype(jnp.float32) * sa_p[:, None], axis=-1)
    return (wq_i8, swq.reshape(1, -1),
            (1.0 / sa_q).reshape(1, C),
            wp_i8, swp.reshape(1, -1),
            (1.0 / sa_p).reshape(1, C))


def _pallas_forward_i8(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
                       sa_qkv, sa_proj, nh: int, eps: float,
                       interpret: bool, nomax: bool = False, avt: int = 0):
    B, S, C = x.shape
    wq_i8, swq, isa_q, wp_i8, swp, isa_p = _prep_int8_mats(
        w_qkv, w_proj, sa_qkv, sa_proj)
    m, e = _group_mats(C, S)
    qb = min(S, int(os.environ.get("DXMI_FUSED_QB", "256")))
    vec = pl.BlockSpec((1, C), lambda b: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_i8, nh=nh, eps=eps, qb=qb, nomax=nomax,
                          avt=avt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            vec, vec,
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            vec,
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            vec, vec, vec,
            pl.BlockSpec((C, 32), lambda b: (0, 0)),
            pl.BlockSpec((32, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(x, gn_scale.reshape(1, C).astype(jnp.float32),
      gn_bias.reshape(1, C).astype(jnp.float32),
      wq_i8, swq, isa_q,
      b_qkv.reshape(1, 3 * C).astype(jnp.float32),
      wp_i8, swp, isa_p,
      b_proj.reshape(1, C).astype(jnp.float32),
      m, e)


@functools.lru_cache(maxsize=None)
def _make_op_i8(nh: int, eps: float, interpret: bool, nomax: bool = False,
                avt: int = 0):
    @jax.custom_vjp
    def op(x, gs, gb, wq, bq, wp, bp, saq, sap):
        return _pallas_forward_i8(x, gs, gb, wq, bq, wp, bp, saq, sap,
                                  nh, eps, interpret, nomax, avt)

    def fwd(x, gs, gb, wq, bq, wp, bp, saq, sap):
        return op(x, gs, gb, wq, bq, wp, bp, saq, sap), (
            x, gs, gb, wq, bq, wp, bp)

    def bwd(res, ct):
        # gradients via the FULL-PRECISION reference (round() is
        # piecewise-constant; the fp path is its smooth surrogate) —
        # sampling/calibration never differentiates this op, training
        # keeps the flash kernel (PERF.md kernel policy)
        ref = functools.partial(attn_block_reference, num_heads=nh, eps=eps)
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct) + (None, None)

    op.defvjp(fwd, bwd)
    return op


def fused_attn_block_int8(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj,
                          b_proj, sa_qkv, sa_proj, num_heads: int,
                          eps: float = 1e-5,
                          interpret: bool | None = None):
    """int8-native fused attention block (W8A8 qkv/proj epilogues inside
    the kernel, bf16 attention core).  ``sa_qkv``/``sa_proj``: (C,)
    calibrated per-input-channel activation scales for the post-GN and
    post-attention activations (the 'quant_scales' collection entries
    recorded by ``AttentionBlockADM`` during calibration).  Same VMEM
    gate as :func:`fused_attn_available`."""
    if interpret is None:
        interpret = not _tpu_backend()
    nomax = os.environ.get("DXMI_FUSED_NOMAX") == "1"
    avt = int(os.environ.get("DXMI_FUSED_AVT", "0"))
    return _make_op_i8(int(num_heads), float(eps), bool(interpret), nomax,
                       avt)(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        jnp.asarray(sa_qkv), jnp.asarray(sa_proj))


def _group_mats(C: int, S: int, groups: int = 32):
    cg = C // groups
    gid = np.arange(C) // cg
    m = np.zeros((C, groups), np.float32)
    m[np.arange(C), gid] = 1.0 / (S * cg)
    e = np.zeros((groups, C), np.float32)
    e[gid, np.arange(C)] = 1.0
    return jnp.asarray(m), jnp.asarray(e)


def _pallas_forward(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
                    nh: int, eps: float, interpret: bool, bb: int = 1,
                    nomax: bool = False, avt: int = 0):
    B, S, C = x.shape
    if bb > 1:
        while B % bb:
            bb -= 1
    if bb > 1:
        m, e = _group_mats(C, S)
        qb = min(S, int(os.environ.get("DXMI_FUSED_QB", "256")))
        vec = pl.BlockSpec((1, C), lambda b: (0, 0))
        return pl.pallas_call(
            functools.partial(_kernel_bb, nh=nh, eps=eps, qb=qb, bb=bb,
                              nomax=nomax),
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, S, C), lambda b: (b, 0, 0)),
                vec, vec,
                pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
                pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
                pl.BlockSpec((C, C), lambda b: (0, 0)),
                vec,
                pl.BlockSpec((C, 32), lambda b: (0, 0)),
                pl.BlockSpec((32, C), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bb, S, C), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
            interpret=interpret,
        )(x, gn_scale.reshape(1, C).astype(jnp.float32),
          gn_bias.reshape(1, C).astype(jnp.float32),
          w_qkv.astype(x.dtype),
          b_qkv.reshape(1, 3 * C).astype(x.dtype),
          w_proj.astype(x.dtype), b_proj.reshape(1, C).astype(x.dtype),
          m, e)
    # split the head-interleaved qkv conv weights into q/k/v planes on the
    # host side (channel layout [3, nh, d], cm/unet.py qkv reshape)
    wq, wk, wv = (w_qkv[:, i * C:(i + 1) * C] for i in range(3))
    bq, bk, bv = (b_qkv[i * C:(i + 1) * C].reshape(1, C) for i in range(3))
    m, e = _group_mats(C, S)
    qb = min(S, int(os.environ.get("DXMI_FUSED_QB", "256")))

    vec = pl.BlockSpec((1, C), lambda b: (0, 0))
    mat = pl.BlockSpec((C, C), lambda b: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, nh=nh, eps=eps, qb=qb, nomax=nomax,
                          avt=avt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            vec, vec,                     # gn scale/bias
            mat, mat, mat,                # wq wk wv
            vec, vec, vec,                # bq bk bv
            mat, vec,                     # wp bp
            pl.BlockSpec((C, 32), lambda b: (0, 0)),
            pl.BlockSpec((32, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(x, gn_scale.reshape(1, C).astype(jnp.float32),
      gn_bias.reshape(1, C).astype(jnp.float32),
      wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype),
      bq.astype(x.dtype), bk.astype(x.dtype), bv.astype(x.dtype),
      w_proj.astype(x.dtype), b_proj.reshape(1, C).astype(x.dtype), m, e)


@functools.lru_cache(maxsize=None)
def _make_op(nh: int, eps: float, interpret: bool, bb: int = 1,
             nomax: bool = False, avt: int = 0):
    @jax.custom_vjp
    def op(x, gs, gb, wq, bq, wp, bp):
        return _pallas_forward(x, gs, gb, wq, bq, wp, bp, nh, eps, interpret,
                               bb, nomax, avt)

    def fwd(x, gs, gb, wq, bq, wp, bp):
        return op(x, gs, gb, wq, bq, wp, bp), (x, gs, gb, wq, bq, wp, bp)

    def bwd(res, ct):
        ref = functools.partial(attn_block_reference, num_heads=nh, eps=eps)
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct)

    op.defvjp(fwd, bwd)
    return op


def fused_attn_block(x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
                     num_heads: int, eps: float = 1e-5,
                     interpret: bool | None = None,
                     block_b: int | None = None):
    """Run the fused attention block. x: (B, S, C); w_qkv: (C, 3C) with
    [3, nh, d] output-channel layout; w_proj: (C, C).  Differentiable
    (backward recomputes via the pure-JAX reference).

    block_b > 1 selects the batch-blocked kernel (qkv/proj matmuls over
    BB*S rows; see _kernel_bb).  Default 1 = the recorded per-element
    kernel; DXMI_FUSED_ATTN_BB overrides for benchmarking.

    The ``fused_attn_available`` VMEM gate (S*C <= 1024*512 since r5)
    assumes the bb=1 working set; bb multiplies per-program activations
    by bb, so bb is clamped here (conservatively at the r1-r4 1024*384
    envelope — bb>1 is a measured-dead-end bench path) to keep bb*S*C
    bounded (and bb <= B, B % bb == 0 — the kernel requires an
    integral grid)."""
    if interpret is None:
        interpret = not _tpu_backend()
    if block_b is None:
        block_b = int(os.environ.get("DXMI_FUSED_ATTN_BB", "1"))
    block_b = int(block_b)
    nomax = os.environ.get("DXMI_FUSED_NOMAX") == "1"
    avt = int(os.environ.get("DXMI_FUSED_AVT", "0"))
    if block_b > 1:
        B, S, C = x.shape
        cap = max(1, (1024 * 384) // (S * C))
        block_b = min(block_b, cap, B)
        while block_b > 1 and B % block_b:
            block_b -= 1
    return _make_op(int(num_heads), float(eps), bool(interpret),
                    int(block_b), nomax, avt)(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj)
