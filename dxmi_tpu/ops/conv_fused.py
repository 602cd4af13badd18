"""Fused GroupNorm + SiLU + 3x3 conv Pallas kernel (experimental).

Targets the U-Net's dominant pattern (PERF.md: ~74% of sampling time is
the conv stack, +14% GN): one VMEM-resident block computes the GN
statistics, normalizes, applies SiLU, and performs the 3x3 convolution as
nine shifted (M, C_in) x (C_in, C_out) MXU matmuls — no HBM round-trips
between GN and conv.

Status: isolated-benchmark stage. Integration into the models is gated on
beating XLA's fused sequence (the standalone GN kernel LOST to XLA —
PERF.md — so the bar is explicit measurement, not intuition).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gn_silu_conv_reference(x, gn_scale, gn_bias, kernel, bias,
                           num_groups: int = 32, eps: float = 1e-6):
    """XLA baseline: GN(fp32 stats) -> SiLU -> 3x3 SAME conv."""
    from dxmi_tpu.ops.groupnorm import group_norm_silu_reference

    h = group_norm_silu_reference(x, gn_scale, gn_bias, num_groups, eps,
                                  silu=True)
    out = jax.lax.conv_general_dilated(
        h, kernel.astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(out.dtype)


def _kernel(x_ref, gn_scale_ref, gn_bias_ref, mask_ref, w_ref, b_ref,
            out_ref, padded_ref, *, eps, inv_n, H, W):
    x = x_ref[:].astype(jnp.float32)          # (Bblk, H, W, C)
    bblk, _, _, C = x.shape
    mask = mask_ref[:]                         # (C, G)

    # ---- GroupNorm stats via mask matmuls ----
    xf = x.reshape(bblk, H * W, C)
    s1 = jnp.sum(xf, axis=1)                   # (Bblk, C)
    s2 = jnp.sum(xf * xf, axis=1)
    gs1 = jnp.dot(s1, mask, preferred_element_type=jnp.float32)
    gs2 = jnp.dot(s2, mask, preferred_element_type=jnp.float32)
    mean_g = gs1 * inv_n
    var_g = gs2 * inv_n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, mask.T, preferred_element_type=jnp.float32)

    h = (xf - mean_c[:, None, :]) * rstd_c[:, None, :]
    h = h * gn_scale_ref[:].astype(jnp.float32) + gn_bias_ref[:].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)                  # SiLU
    h = h.reshape(bblk, H, W, C).astype(jnp.bfloat16)

    # ---- zero-padded copy for the shifted-matmul conv ----
    padded_ref[:] = jnp.zeros_like(padded_ref)
    padded_ref[:, 1:H + 1, 1:W + 1, :] = h

    # ---- conv3x3 = 9 shifted matmuls, f32 accumulation ----
    C_out = w_ref.shape[-1]
    acc = jnp.zeros((bblk * H * W, C_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = padded_ref[:, dy:dy + H, dx:dx + W, :]
            acc = acc + jnp.dot(window.reshape(bblk * H * W, C),
                                w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    out_ref[:] = acc.reshape(bblk, H, W, C_out).astype(out_ref.dtype)


def _eligible(x, kernel, num_groups: int) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    B, H, W, C = x.shape
    C_out = kernel.shape[-1]
    if C % 128 or C_out % 128 or C % num_groups:
        return False
    # VMEM working set for bblk=4: f32 x + bf16 padded + f32 acc + out
    per = 4 * (H * W * C * 4 + (H + 2) * (W + 2) * C * 2
               + H * W * C_out * 6)
    return per <= 12 * 1024 * 1024 and B % 2 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_gn_silu_conv(x, gn_scale, gn_bias, kernel, bias,
                       num_groups: int = 32, eps: float = 1e-6):
    """Differentiable fused GN+SiLU+conv3x3: Pallas forward on TPU for
    eligible shapes, XLA reference elsewhere; backward recomputes through
    the reference composition."""
    if _eligible(x, kernel, num_groups):
        return gn_silu_conv_fused(x, gn_scale, gn_bias, kernel, bias,
                                  num_groups, eps)
    return gn_silu_conv_reference(x, gn_scale, gn_bias, kernel, bias,
                                  num_groups, eps)


def _fgsc_fwd(x, gn_scale, gn_bias, kernel, bias, num_groups, eps):
    out = fused_gn_silu_conv(x, gn_scale, gn_bias, kernel, bias,
                             num_groups, eps)
    return out, (x, gn_scale, gn_bias, kernel, bias)


def _fgsc_bwd(num_groups, eps, res, g):
    x, gn_scale, gn_bias, kernel, bias = res
    _, vjp = jax.vjp(
        lambda *a: gn_silu_conv_reference(*a, num_groups=num_groups, eps=eps),
        x, gn_scale, gn_bias, kernel, bias)
    return vjp(g.astype(jnp.float32) if g.dtype != jnp.float32 else g)


fused_gn_silu_conv.defvjp(_fgsc_fwd, _fgsc_bwd)


def gn_silu_conv_fused(x, gn_scale, gn_bias, kernel, bias,
                       num_groups: int = 32, eps: float = 1e-6,
                       bblk: int = 4):
    """Pallas fused GN+SiLU+conv3x3 (SAME). x: (B, H, W, C_in) bf16/f32;
    kernel: (3, 3, C_in, C_out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    C_out = kernel.shape[-1]
    G = num_groups
    while B % bblk:
        bblk -= 1
    inv_n = 1.0 / (H * W * (C // G))

    mask = np.zeros((C, G), np.float32)
    mask[np.arange(C), np.arange(C) // (C // G)] = 1.0

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, inv_n=inv_n, H=H, W=W),
        grid=(B // bblk,),
        in_specs=[
            pl.BlockSpec((bblk, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C_out), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bblk, H, W, C_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bblk, H + 2, W + 2, C), jnp.bfloat16),
        ],
    )(x, gn_scale.reshape(1, C), gn_bias.reshape(1, C), jnp.asarray(mask),
      kernel.astype(jnp.bfloat16), bias.reshape(1, C_out))
