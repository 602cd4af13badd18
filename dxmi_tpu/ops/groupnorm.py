"""Fused GroupNorm(+SiLU) Pallas kernel.

The reference leans on cuDNN fusion for its GroupNorm->SiLU->conv blocks
(SURVEY.md §2.1 native-boundary note). On TPU, XLA lowers GroupNorm as
separate reduce + normalize passes with fp32 casts around them; this
kernel does the whole thing — fp32 statistics, normalize, affine, optional
SiLU — in ONE VMEM pass per tile, with group reductions expressed as tiny
matmuls against a one-hot group mask (MXU/VPU friendly; avoids lane-dim
reshapes).

Used by the networks via ``fused_group_norm`` which:
  * runs the Pallas kernel on TPU for shapes that fit VMEM,
  * falls back to the pure-jnp reference elsewhere (CPU tests, huge maps),
  * is differentiable everywhere: a custom VJP recomputes the backward
    through the jnp reference implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VMEM budget per input block (bytes of fp32 working set)
_VMEM_BLOCK_BUDGET = 6 * 1024 * 1024


def _gn_stats_mode() -> str:
    """GN statistics formulation (measured on-chip, scripts/bench_int8_gap.py
    + bench_gn_stats.py — GN stats are the dominant non-conv cost of the
    int8 sampling path):

      'fp32'    — two-pass fp32 stats (parity default; bit-matches the
                  round-1 behavior and the reference's GroupNorm32)
      'onepass' — fp32 s1/s2 one-pass stats (both reductions read x once;
                  E[x^2]-E[x]^2 in fp32 is safe at GN activation scales)
      'bf16'    — stats in the compute dtype, two-pass
      'bf16_onepass' — compute-dtype s1/s2 with fp32 accumulation
      'bf16_onepass_sub2' / 'bf16_onepass_sub4' — bf16_onepass with the
                  statistics estimated from every 2nd/4th spatial ROW
                  (contiguous (W,C) blocks, so the skipped rows are never
                  read). Applied only when the map has >= 256 spatial
                  positions — small maps keep exact stats. Estimation is
                  unbiased with 2x/4x estimator variance; quality is
                  gated at the FID level (scripts/bench_int8_quality.py),
                  same discipline as the bf16-stats step.
    """
    import os

    return os.environ.get("DXMI_GN_STATS", "fp32")


def group_norm_silu_reference(x, scale, bias, num_groups: int, eps: float,
                              silu: bool):
    """Pure-jnp GroupNorm(+SiLU). x: (..., C). Statistics formulation is
    selected by DXMI_GN_STATS (default: two-pass fp32 — see _gn_stats_mode)."""
    mode = _gn_stats_mode()
    sub = 1
    if mode.endswith("_sub2") or mode.endswith("_sub4"):
        sub = int(mode[-1])
        mode = mode[:-5]
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    sdt = jnp.float32 if mode in ("fp32", "onepass") else x.dtype
    xf = x.astype(sdt).reshape(B, -1, num_groups, C // num_groups)
    if mode in ("onepass", "bf16_onepass"):
        xs = xf
        if sub > 1 and x.ndim == 4 and x.shape[1] * x.shape[2] >= 256 \
                and x.shape[1] % sub == 0:
            # estimate stats from every sub-th spatial row: x is NHWC, so
            # the kept rows are contiguous (W, C) blocks and the skipped
            # rows are never read
            xs = x.astype(sdt)[:, ::sub].reshape(
                B, -1, num_groups, C // num_groups)
        n = xs.shape[1] * xs.shape[3]
        s1 = jnp.sum(xs, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(xs * xs, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        mean = (s1 / n).astype(sdt)
        var = jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0).astype(sdt)
    else:
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, -1, C) * scale.astype(sdt) + bias.astype(sdt)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape).astype(orig_dtype)


def group_norm_silu_cat2_reference(xa, xb, scale, bias, num_groups: int,
                                   eps: float, silu: bool):
    """GroupNorm(+SiLU) over the IMPLICIT concatenation of ``xa`` and
    ``xb`` along channels, WITHOUT materializing the concat.

    Statistics are exact: per-channel moment sums are computed per branch
    (each branch is read directly from its producer's buffer), combined
    into the (B, G) group statistics — identical math to
    ``group_norm_silu_reference(concat([xa, xb], -1), ...)`` up to fp
    reassociation of the channel-sum order. Returns the two normalized
    branches separately so the consumer (a split conv, see
    models/unet_small.py SplitConv) never needs the concatenated tensor.
    This removes the skip-concat HBM materialization in the U-Net decoder
    (reference reads/writes the concat three times per decoder block,
    unet_small.py:296-300).

    Honors the same DXMI_GN_STATS modes as the single-input form (the
    spatial-subsample variants fall back to exact stats — they were
    measured dead ends, PERF.md negative result #7)."""
    mode = _gn_stats_mode()
    if mode.endswith("_sub2") or mode.endswith("_sub4"):
        mode = mode[:-5]
    orig_dtype = xa.dtype
    B = xa.shape[0]
    Ca, Cb = xa.shape[-1], xb.shape[-1]
    C = Ca + Cb
    G = num_groups
    gs = C // G
    sdt = jnp.float32 if mode in ("fp32", "onepass") else xa.dtype

    xfa = xa.astype(sdt).reshape(B, -1, Ca)
    xfb = xb.astype(sdt).reshape(B, -1, Cb)
    n = xfa.shape[1] * gs

    s1 = jnp.concatenate([jnp.sum(xfa, 1, dtype=jnp.float32),
                          jnp.sum(xfb, 1, dtype=jnp.float32)], -1)
    mean_g = (s1.reshape(B, G, gs).sum(-1) / n).astype(sdt)      # (B, G)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)                     # (B, C)

    if mode in ("onepass", "bf16_onepass"):
        s2 = jnp.concatenate([jnp.sum(xfa * xfa, 1, dtype=jnp.float32),
                              jnp.sum(xfb * xfb, 1, dtype=jnp.float32)], -1)
        m = mean_g.astype(jnp.float32)
        var_g = jnp.maximum(s2.reshape(B, G, gs).sum(-1) / n - m * m,
                            0.0).astype(sdt)
    else:
        da = xfa - mean_c[:, None, :Ca]
        db = xfb - mean_c[:, None, Ca:]
        v = jnp.concatenate([jnp.sum(da * da, 1).astype(jnp.float32),
                             jnp.sum(db * db, 1).astype(jnp.float32)], -1)
        var_g = (v.reshape(B, G, gs).sum(-1) / n).astype(sdt)

    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), gs, axis=-1)  # (B, C)

    def _apply(xf, lo, hi, shape):
        y = (xf - mean_c[:, None, lo:hi]) * rstd_c[:, None, lo:hi]
        y = y * scale[lo:hi].astype(sdt) + bias[lo:hi].astype(sdt)
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y.reshape(shape).astype(orig_dtype)

    return _apply(xfa, 0, Ca, xa.shape), _apply(xfb, Ca, C, xb.shape)


def _kernel(x_ref, scale_ref, bias_ref, mask_ref, out_ref, *, eps, silu, inv_n):
    # x_ref: (Bblk, HW, C); mask_ref: (C, G) one-hot group mask
    x = x_ref[:].astype(jnp.float32)
    bblk, hw, c = x.shape
    mask = mask_ref[:]

    s1 = jnp.sum(x, axis=1)                     # (Bblk, C)
    s2 = jnp.sum(x * x, axis=1)                 # (Bblk, C)
    gs1 = jnp.dot(s1, mask, preferred_element_type=jnp.float32)  # (Bblk, G)
    gs2 = jnp.dot(s2, mask, preferred_element_type=jnp.float32)
    mean_g = gs1 * inv_n
    var_g = gs2 * inv_n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, mask.T, preferred_element_type=jnp.float32)

    y = (x - mean_c[:, None, :]) * rstd_c[:, None, :]
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[:] = y.astype(out_ref.dtype)


def _pick_bblk(B: int, hw: int, c: int) -> int:
    per_sample = hw * c * 4 * 4  # fp32 x, y, and temporaries
    bblk = max(int(_VMEM_BLOCK_BUDGET // max(per_sample, 1)), 1)
    bblk = min(bblk, 8, B)
    while B % bblk:
        bblk -= 1
    return max(bblk, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-6,
                     silu: bool = False):
    return _forward(x, scale, bias, num_groups, eps, silu)


def _use_pallas(x) -> bool:
    # Benchmarked on v5e (CIFAR U-Net, batch 512): the Pallas GN is ~17%
    # SLOWER end-to-end than XLA's native GN fusion — pulling GN into an
    # opaque kernel breaks XLA's larger producer/consumer fusions around
    # it. Kept available behind DXMI_FUSED_GN=1 for future shapes where a
    # hand kernel wins (e.g. HBM-bound 256^2 maps).
    import os

    if os.environ.get("DXMI_FUSED_GN", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    B = x.shape[0]
    hw = int(np.prod(x.shape[1:-1]))
    c = x.shape[-1]
    # per-sample fp32 working set inside the kernel is ~4x the input block
    # (x cast, y, and reduction temporaries); keep it well under the 16 MB
    # VMEM scoped limit
    return hw * c * 16 <= _VMEM_BLOCK_BUDGET and c % 128 == 0


def _forward(x, scale, bias, num_groups, eps, silu):
    if not _use_pallas(x):
        return group_norm_silu_reference(x, scale, bias, num_groups, eps, silu)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x.shape[0]
    C = x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    G = num_groups
    x3 = x.reshape(B, hw, C)
    bblk = _pick_bblk(B, hw, C)
    inv_n = 1.0 / (hw * (C // G))

    mask = np.zeros((C, G), np.float32)
    mask[np.arange(C), np.arange(C) // (C // G)] = 1.0

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, silu=silu, inv_n=inv_n),
        grid=(B // bblk,),
        in_specs=[
            pl.BlockSpec((bblk, hw, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bblk, hw, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
    )(x3, scale.reshape(1, C), bias.reshape(1, C), jnp.asarray(mask))
    return out.reshape(x.shape)


def _fwd(x, scale, bias, num_groups, eps, silu):
    return _forward(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


def _bwd(num_groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_silu_reference(
            x_, s_, b_, num_groups, eps, silu), x, scale, bias)
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)
