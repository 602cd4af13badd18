"""The small DDPM U-Net (Ho et al. CIFAR-10 architecture), TPU-native.

Capability parity with /root/reference/models/DxMI/unet_small.py (the
SFT-PG/DDPM backbone): same computation graph — sinusoidal time embedding,
GroupNorm(32, eps=1e-6) + swish ResNet blocks with time-embedding injection,
single-head self-attention at selected resolutions, skip-concat decoder —
but re-designed for TPU:

  * NHWC layout (XLA:TPU's native conv layout; avoids transposes around
    every convolution),
  * fp32 parameters with a configurable compute dtype (bf16 on TPU —
    GroupNorm statistics are always taken in fp32),
  * attention runs as one batched einsum pair so XLA tiles it onto the MXU.

Weight-layout conversion from the reference's PyTorch checkpoints is in
``dxmi_tpu.utils.convert``.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.ops import trig


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching the DDPM/tensor2tensor variant
    used by the reference (unet_small.py:9-27): frequency base
    exp(-log(10000) * i / (half-1)), concat(sin, cos), zero-pad if odd."""
    half = dim // 2
    # The frequencies are static, so build them host-side: the f32 product
    # matches the reference's op order, exp is evaluated in f64 and
    # correctly rounded to f32 (XLA's on-device f32 exp is ~2e-6 off, which
    # would shift sin arguments by ~2e-3 rad at t ~ 1000).
    c = math.log(max_period) / (half - 1)
    exponents = np.arange(half, dtype=np.float32) * np.float32(-c)
    freqs = jnp.asarray(np.exp(exponents.astype(np.float64)).astype(np.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    # accurate large-argument trig (see dxmi_tpu/ops/trig.py)
    r = trig.reduce_mod_2pi(args)
    emb = jnp.concatenate([jnp.sin(r), jnp.cos(r)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)



def _conv(quant, features, kernel_size, dtype, name,
          strides=(1, 1), padding=1, use_bias=True, kernel_init=None):
    """nn.Conv or the int8 QConv (same param tree) per the quant flag
    (False | True = dynamic ranges | 'static' = calibrated ranges).
    DXMI_CONV_TAPS=1 swaps stride-1 3x3 convs to the 9-shifted-matmul
    formulation (ops/conv_taps.py; param-tree identical)."""
    if quant:
        from dxmi_tpu.ops.quant import QConv

        return QConv(features, kernel_size, strides=strides, padding=padding,
                     use_bias=use_bias, dtype=dtype, name=name,
                     static_act=(quant == "static"),
                     kernel_init=kernel_init)
    if (kernel_size == (3, 3) and strides == (1, 1) and padding == 1
            and kernel_init is None
            and os.environ.get("DXMI_CONV_TAPS", "0") == "1"):
        from dxmi_tpu.ops.conv_taps import Conv3x3Taps

        return Conv3x3Taps(features, use_bias=use_bias, dtype=dtype, name=name)
    kw = {} if kernel_init is None else {"kernel_init": kernel_init}
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name, **kw)

class _GNParams(nn.Module):
    """Holds the affine params under a child scope named 'gn' so the param
    tree matches nn.GroupNorm's (<mod>/gn/{scale,bias}) for the
    torch->flax converter."""

    num_groups: int
    eps: float
    silu: bool

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        from dxmi_tpu.ops.groupnorm import (fused_group_norm,
                                            group_norm_silu_cat2_reference)

        if isinstance(x, (tuple, list)):
            # implicit-concat GN over two branches (split-concat decoder)
            xa, xb = x
            C = xa.shape[-1] + xb.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            return group_norm_silu_cat2_reference(
                xa, xb, scale, bias, self.num_groups, self.eps, self.silu)
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return fused_group_norm(x, scale, bias, self.num_groups, self.eps,
                                self.silu)


class GroupNorm32(nn.Module):
    """GroupNorm with statistics in fp32 regardless of compute dtype
    (the reference's large model relies on fp32 GN, cm/nn.py:19-21; the
    small model uses default GN — fp32 stats are a strict improvement and
    bit-compatible in fp32 mode).

    ``silu=True`` fuses the following SiLU into the same kernel (one VMEM
    pass on TPU via the Pallas kernel in dxmi_tpu/ops/groupnorm.py)."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, silu: bool = False) -> jnp.ndarray:
        return _GNParams(self.num_groups, self.eps, silu, name="gn")(x)



class _GNLeaf(nn.Module):
    """Bare GN affine params (path <parent>/gn/{scale,bias}) for fused ops."""

    @nn.compact
    def __call__(self, C: int):
        return (self.param("scale", nn.initializers.ones, (C,)),
                self.param("bias", nn.initializers.zeros, (C,)))


class _GNHolder(nn.Module):
    @nn.compact
    def __call__(self, C: int):
        return _GNLeaf(name="gn")(C)


class _ConvHolder(nn.Module):
    """Bare conv params (kernel/bias) compatible with nn.Conv's tree."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, C_in: int):
        kh, kw = self.kernel_size
        k = self.param("kernel", self.kernel_init,
                       (kh, kw, C_in, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SplitConv(nn.Module):
    """Conv over the IMPLICIT concat of two inputs along channels.

    ``conv(concat([xa, xb], -1), K) == conv(xa, K[:, :, :Ca]) +
    conv(xb, K[:, :, Ca:])`` exactly in real arithmetic — the split runs
    the same MACs without ever materializing the concatenated tensor
    (the decoder's dominant non-conv HBM traffic; the reference
    materializes torch.cat explicitly, unet_small.py:296-300).

    Parameter tree ('kernel' (kh,kw,Ca+Cb,out), 'bias') and — under
    ``quant='static'`` — the 'quant_scales/act_scale' (Ca+Cb,) variable
    are identical to nn.Conv / ops.quant.QConv, so checkpoints and
    calibrations transfer between skip_concat modes."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    quant: Any = False

    @nn.compact
    def __call__(self, xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
        from dxmi_tpu.ops.quant import (calib_channel_scale, int8_conv,
                                        int8_conv_static)

        Ca, Cb = xa.shape[-1], xb.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, Ca + Cb, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))

        def bf_conv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), self.strides,
                pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ka, kb = kernel[:, :, :Ca], kernel[:, :, Ca:]
        if self.quant == "static":
            scale_var = self.variable(
                "quant_scales", "act_scale",
                lambda: jnp.zeros((Ca + Cb,), jnp.float32))
            if self.is_mutable_collection("quant_scales"):
                # calibration: per-input-channel ranges over both branches
                # (same statistic the concat path records), fp forward
                amax = jnp.concatenate(
                    [calib_channel_scale(xa.reshape(-1, Ca)),
                     calib_channel_scale(xb.reshape(-1, Cb))])
                scale_var.value = jnp.maximum(scale_var.value, amax)
                y = bf_conv(xa, ka) + bf_conv(xb, kb)
            else:
                s = scale_var.value
                y = (int8_conv_static(xa, ka, None, s[:Ca], self.strides,
                                      pad, out_dtype=jnp.float32)
                     + int8_conv_static(xb, kb, None, s[Ca:], self.strides,
                                        pad, out_dtype=jnp.float32)
                     ).astype(self.dtype)
        elif self.quant:
            y = (int8_conv(xa, ka, None, self.strides, pad,
                           out_dtype=jnp.float32)
                 + int8_conv(xb, kb, None, self.strides, pad,
                             out_dtype=jnp.float32)).astype(self.dtype)
        else:
            y = bf_conv(xa, ka) + bf_conv(xb, kb)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    # fuse GN+SiLU+conv3x3 into one Pallas kernel (dxmi_tpu/ops/conv_fused)
    fuse_gn_conv: bool = False

    @nn.compact
    def __call__(self, x, temb: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        from dxmi_tpu.ops.conv_fused import fused_gn_silu_conv

        if isinstance(x, (tuple, list)):
            # split-concat decoder input: GN + conv1 + nin_shortcut all run
            # on the two branches directly; the concatenated tensor never
            # exists (param tree identical to the concat path)
            xa, xb = x
            in_channels = xa.shape[-1] + xb.shape[-1]
            assert in_channels != self.out_channels, \
                "split-concat residual requires a nin_shortcut"
            ha, hb = GroupNorm32(dtype=self.dtype, name="norm1")(
                (xa, xb), silu=True)
            h = SplitConv(self.out_channels, (3, 3), dtype=self.dtype,
                          quant=self.quant, name="conv1")(ha, hb)
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 name="temb_proj")(swish(temb))
            h = h + temb_proj[:, None, None, :]
            h = GroupNorm32(dtype=self.dtype, name="norm2")(h, silu=True)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _conv(self.quant, self.out_channels, (3, 3), self.dtype,
                      "conv2")(h)
            sc = SplitConv(self.out_channels, (1, 1), padding=0,
                           dtype=self.dtype, quant=self.quant,
                           name="nin_shortcut")(xa, xb)
            return sc + h

        in_channels = x.shape[-1]
        fuse = self.fuse_gn_conv and not self.quant
        if fuse:
            gs1, gb1 = _GNHolder(name="norm1")(in_channels)
            k1, b1 = _ConvHolder(self.out_channels, name="conv1")(in_channels)
            h = fused_gn_silu_conv(x.astype(self.dtype), gs1, gb1,
                                   k1, b1, 32, 1e-6)
        else:
            h = GroupNorm32(dtype=self.dtype, name="norm1")(x, silu=True)
            h = _conv(self.quant, self.out_channels, (3, 3), self.dtype, "conv1")(h)

        temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="temb_proj")(swish(temb))
        h = h + temb_proj[:, None, None, :]

        # the second GN+conv can fuse only when dropout is inactive
        if fuse and (self.dropout == 0.0 or deterministic):
            gs2, gb2 = _GNHolder(name="norm2")(self.out_channels)
            k2, b2 = _ConvHolder(self.out_channels, name="conv2")(self.out_channels)
            h = fused_gn_silu_conv(h, gs2, gb2, k2, b2, 32, 1e-6)
        else:
            h = GroupNorm32(dtype=self.dtype, name="norm2")(h, silu=True)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = _conv(self.quant, self.out_channels, (3, 3), self.dtype, "conv2")(h)

        if in_channels != self.out_channels:
            x = _conv(self.quant, self.out_channels, (1, 1), self.dtype,
                      "nin_shortcut", padding=0)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the flattened feature map
    (reference unet_small.py:139-191).

    ``softmax_f32`` keeps the softmax in fp32 (parity default); flipping it
    saves a 2x-sized logits round-trip in bf16 mode."""

    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    quant: bool = False
    # 'einsum' = reference semantics (two XLA matmuls, materialized
    # logits); 'einsum_merged' = same math but the q/k/v 1x1 convs run as
    # ONE (C, 3C) matmul built from the unchanged per-conv params at trace
    # time (reads the normed map once instead of three times; identical
    # per-channel dot products, checkpoint-compatible param tree);
    # 'einsum_folded' = merged q/k PLUS the algebraic fold of the v conv
    # and proj_out into one (C,C) matmul: softmax rows sum to 1, so
    #   (w @ (h Wv + bv)) Wp + bp  ==  w @ (h (Wv Wp)) + (bv Wp + bp)
    # exactly — one whole (S,C)x(C,C) matmul and its HBM intermediate
    # disappear per block, and the C^-1/2 logit scale folds into Wq.
    # Mathematically exact, bf16-rounding-class drift only, checkpoint-
    # compatible param tree (folds are built from the per-conv params at
    # trace time);
    # 'fused' = the whole block (GN+q/k/v+attention+proj+
    # residual) as ONE Pallas kernel (ops/attn_block.py, single-head
    # d=C path) where its gate admits the shape; the fused kernel runs
    # its 1x1s in the compute dtype so int8 nets keep einsum paths.
    # Under quant='static', 'einsum_merged' runs the q/k/v projections
    # as ONE W8A8 int8 (C,3C) matmul with a shared per-input-channel
    # act_scale — numerically identical to three split int8 1x1 convs
    # (same input => same calibrated scales); logits/AV einsums and the
    # softmax stay in the compute dtype.
    # NOTE: the PARAMS tree is identical across attn_impl values, but the
    # calibrated 'quant_scales' collection is NOT transferable between
    # them (einsum_merged stores one block-level act_scale where the
    # split path stores per-QConv q/k/v scales) — recalibrate after
    # switching attn_impl.
    attn_impl: str = "einsum"
    # skip the max-subtraction pass of the softmax: rows normalize
    # exp(l)/sum(exp(l)) directly — identical in exact arithmetic (the
    # max-shift is a mathematical no-op), saves one full traversal of
    # the (B,S,S) logits per block. Safe while |logits| stays well under
    # exp overflow (~88; the C^-0.5 scale keeps trained logits O(10)).
    # Quality-gated opt-in like every numerics-class lever (PERF.md).
    softmax_nomax: bool = False

    def _softmax(self, logits, acc):
        if self.softmax_nomax:
            e = jnp.exp(logits.astype(acc))
            return (e / jnp.sum(e, axis=-1, keepdims=True,
                                dtype=jnp.float32).astype(acc)
                    ).astype(self.dtype)
        return jax.nn.softmax(logits.astype(acc), axis=-1).astype(self.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from dxmi_tpu.ops.attn_block import (fused_attn_available,
                                             fused_attn_block)

        B, H, W, C = x.shape
        if (self.attn_impl == "fused" and not self.quant
                and fused_attn_available(H * W, C, 1)):
            S = H * W
            gs, gb = _GNHolder(name="norm")(C)
            kq, bq = _ConvHolder(C, (1, 1), name="q")(C)
            kk, bk = _ConvHolder(C, (1, 1), name="k")(C)
            kv, bv = _ConvHolder(C, (1, 1), name="v")(C)
            kp, bp = _ConvHolder(C, (1, 1), name="proj_out")(C)
            # kernel scale convention: (d**-0.25 on q)·(d**-0.25 on k)
            # = C**-0.5 at nh=1 — exactly the reference's logit scale
            w_qkv = jnp.concatenate(
                [kq.reshape(C, C), kk.reshape(C, C), kv.reshape(C, C)], axis=1)
            b_qkv = jnp.concatenate([bq, bk, bv])
            y = fused_attn_block(x.reshape(B, S, C).astype(self.dtype),
                                 gs, gb, w_qkv, b_qkv, kp.reshape(C, C), bp,
                                 num_heads=1, eps=1e-6)
            return y.reshape(B, H, W, C)
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        if self.attn_impl == "einsum_folded" and not self.quant:
            kq, bq = _ConvHolder(C, (1, 1), name="q")(C)
            kk, bk = _ConvHolder(C, (1, 1), name="k")(C)
            kv, bv = _ConvHolder(C, (1, 1), name="v")(C)
            kp, bp = _ConvHolder(C, (1, 1), name="proj_out")(C)
            s = C ** -0.5
            # folds are computed in fp32 from the fp32 params, then cast
            w_qk = jnp.concatenate(
                [kq.reshape(C, C) * s, kk.reshape(C, C)],
                axis=1).astype(self.dtype)
            b_qk = jnp.concatenate([bq * s, bk]).astype(self.dtype)
            w_vp = (kv.reshape(C, C) @ kp.reshape(C, C)).astype(self.dtype)
            b_vp = (bv @ kp.reshape(C, C) + bp).astype(self.dtype)
            h2 = h.reshape(B, H * W, C)
            q, k = jnp.split(h2 @ w_qk + b_qk, 2, axis=-1)
            acc = jnp.float32 if self.softmax_f32 else self.dtype
            logits = jnp.einsum("bqc,bkc->bqk", q, k,
                                preferred_element_type=acc)
            w = self._softmax(logits, acc)
            hv = h2 @ w_vp
            out = jnp.einsum("bqk,bkc->bqc", w, hv).reshape(B, H, W, C)
            return x + out + b_vp
        if self.attn_impl == "einsum_merged" and self.quant in (False, "static"):
            kq, bq = _ConvHolder(C, (1, 1), name="q")(C)
            kk, bk = _ConvHolder(C, (1, 1), name="k")(C)
            kv, bv = _ConvHolder(C, (1, 1), name="v")(C)
            w_qkv = jnp.concatenate(
                [kq.reshape(C, C), kk.reshape(C, C), kv.reshape(C, C)], axis=1)
            b_qkv = jnp.concatenate([bq, bk, bv])
            h2 = h.reshape(B, H * W, C)
            if self.quant == "static":
                # W8A8 merged qkv: ONE int8 (C,3C) matmul. Shares one
                # per-input-channel act_scale across q/k/v (same input),
                # so numerics match three split int8 1x1 convs exactly.
                from dxmi_tpu.ops.quant import (calib_channel_scale,
                                                int8_matmul_static)
                scale_var = self.variable(
                    "quant_scales", "act_scale",
                    lambda: jnp.zeros((C,), jnp.float32))
                if self.is_mutable_collection("quant_scales"):
                    scale_var.value = jnp.maximum(
                        scale_var.value,
                        calib_channel_scale(h2.reshape(-1, C)))
                    qkv = (h2 @ w_qkv.astype(self.dtype)
                           + b_qkv.astype(self.dtype))
                else:
                    qkv = int8_matmul_static(h2, w_qkv, b_qkv,
                                             scale_var.value,
                                             out_dtype=self.dtype)
            else:
                qkv = h2 @ w_qkv.astype(self.dtype) + b_qkv.astype(self.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _conv(self.quant, C, (1, 1), self.dtype, "q", padding=0)(h).reshape(B, H * W, C)
            k = _conv(self.quant, C, (1, 1), self.dtype, "k", padding=0)(h).reshape(B, H * W, C)
            v = _conv(self.quant, C, (1, 1), self.dtype, "v", padding=0)(h).reshape(B, H * W, C)

        scale = C ** -0.5
        acc = jnp.float32 if self.softmax_f32 else self.dtype
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=acc) * scale
        w = self._softmax(logits, acc)
        h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
        h = _conv(self.quant, C, (1, 1), self.dtype, "proj_out", padding=0)(h)
        return x + h


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            # asymmetric (0,1) pad on H and W, then stride-2 VALID conv —
            # mirrors the reference's manual pad (unet_small.py:69-76)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return _conv(self.quant, x.shape[-1], (3, 3), self.dtype, "conv",
                         strides=(2, 2),
                         padding=((0, 0), (0, 0)) if self.quant else "VALID")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest-x2 upsample followed by a 3x3 conv (reference
    unet_small.py:51-66).

    ``up_impl='phase'`` computes the SAME function without ever
    materializing the 4x-inflated intermediate: since
    ``u[2i+a, 2j+b] = x[i, j]``, each output phase (a, b) of
    ``conv3x3(nearest_up2(x))`` touches only a 2x2 neighborhood of x
    with phase-specific tap sums —

        a=0 rows: offsets {-1, 0} with taps [W0, W1+W2]
        a=1 rows: offsets {0, +1} with taps [W0+W1, W2]

    (same along columns), so the whole op is FOUR dense 2x2 convs on
    the SMALL grid + a pixel-shuffle interleave: 16*H*W*C^2 MACs vs the
    resize path's 36, and the (2H, 2W, C) nearest-resize tensor never
    hits HBM. Exact in real arithmetic (fp reassociation of the tap
    sums only); zero-padding on the upsampled grid maps exactly to
    zero-padding on x. Param tree identical to the resize path
    (conv/{kernel,bias}); under quant='static' the calibrated
    act_scale transfers exactly (nearest-repeat preserves per-channel
    quantiles) but is stored module-level like the merged-qkv path —
    recalibrate when switching up_impl."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    up_impl: str = "resize"  # 'resize' | 'phase'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if self.with_conv and self.up_impl == "phase":
            return self._phase(x)
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        if self.with_conv:
            x = _conv(self.quant, C, (3, 3), self.dtype, "conv")(x)
        return x

    def _phase(self, x: jnp.ndarray) -> jnp.ndarray:
        from dxmi_tpu.ops.phase_up import conv3x3_nearest_up2
        from dxmi_tpu.ops.quant import calib_channel_scale

        B, H, W, C = x.shape
        k, b = _ConvHolder(C, (3, 3), name="conv")(C)

        act_scale = None
        if self.quant == "static":
            scale_var = self.variable("quant_scales", "act_scale",
                                      lambda: jnp.zeros((C,), jnp.float32))
            if self.is_mutable_collection("quant_scales"):
                scale_var.value = jnp.maximum(
                    scale_var.value, calib_channel_scale(x.reshape(-1, C)))
            else:
                act_scale = scale_var.value
        return conv3x3_nearest_up2(x, k, b, self.dtype, act_scale)


class UNetSmall(nn.Module):
    """DDPM CIFAR U-Net. ``__call__(x_nhwc, t) -> eps_nhwc``.

    Config mirrors the reference constructor (unet_small.py:194-205):
    ch, out_ch, ch_mult, num_res_blocks, attn_resolutions, dropout,
    resamp_with_conv, in_channels, resolution.
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 32
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    # see AttnBlock.softmax_nomax (exact-math, quality-gated opt-in)
    softmax_nomax: bool = False
    # int8 (W8A8) sampling mode: all interior convs run on the int8 MXU
    # path (2x peak); conv_in/conv_out stay high precision. Inference-only
    # accuracy/perf trade — see PERF.md roofline and dxmi_tpu/ops/quant.py.
    # False | True (dynamic ranges) | "static" (calibrated ranges — run
    # VARSampler.calibrate_quant first).
    quant_int8: Any = False
    # selective int8 exclusions (drift/throughput trade, PERF.md):
    # keep the attention qkv/proj convs in bf16 / keep the full-res final
    # decoder level (up_0 blocks) in bf16 while the rest runs int8
    quant_skip_attn: bool = False
    quant_skip_last_level: bool = False
    fuse_gn_conv: bool = False
    # attention implementation: see AttnBlock.attn_impl
    attn_impl: str = 'einsum'
    # decoder skip handling: 'concat' materializes jnp.concatenate([h,
    # skip]) (reference semantics, unet_small.py:296-300); 'split' feeds
    # the two branches through GN/conv1/nin_shortcut separately — same
    # math (conv over an implicit concat distributes over the channel
    # split), no concatenated tensor in HBM. Param tree identical.
    skip_concat: str = 'concat'
    # decoder upsample implementation: see Upsample.up_impl ('resize'
    # reference semantics | 'phase' = 4 dense 2x2 convs on the small
    # grid + pixel shuffle, 2.25x fewer MACs, no 4x intermediate)
    up_impl: str = 'resize'

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        assert x.shape[1] == x.shape[2] == self.resolution, x.shape
        attn_quant = False if self.quant_skip_attn else self.quant_int8
        num_resolutions = len(self.ch_mult)
        temb_ch = self.ch * 4

        # timestep embedding MLP
        temb = timestep_embedding(t, self.ch)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense0")(temb.astype(self.dtype))
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense1")(swish(temb))

        x = x.astype(self.dtype)
        hs = [nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)]
        curr_res = self.resolution

        # encoder
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                                name=f"down_{i_level}_block_{i_block}")(
                    hs[-1], temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, softmax_f32=self.softmax_f32, quant=attn_quant, attn_impl=self.attn_impl, softmax_nomax=self.softmax_nomax,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(Downsample(self.resamp_with_conv, dtype=self.dtype, quant=self.quant_int8,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        # middle
        h = hs[-1]
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                        name="mid_block_1")(h, temb, deterministic=deterministic)
        h = AttnBlock(dtype=self.dtype, softmax_f32=self.softmax_f32, quant=attn_quant, attn_impl=self.attn_impl, softmax_nomax=self.softmax_nomax, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                        name="mid_block_2")(h, temb, deterministic=deterministic)

        # decoder with skip concat
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                blk_quant = (False if (self.quant_skip_last_level
                                       and i_level == 0) else self.quant_int8)
                skip = hs.pop()
                blk_in = ((h, skip) if self.skip_concat == "split"
                          else jnp.concatenate([h, skip], axis=-1))
                h = ResnetBlock(block_out, self.dropout, dtype=self.dtype, quant=blk_quant, fuse_gn_conv=self.fuse_gn_conv,
                                name=f"up_{i_level}_block_{i_block}")(
                    blk_in, temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, softmax_f32=self.softmax_f32, quant=attn_quant, attn_impl=self.attn_impl, softmax_nomax=self.softmax_nomax,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv, dtype=self.dtype, quant=self.quant_int8,
                             up_impl=self.up_impl,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        assert not hs

        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h, silu=True)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class UNetSmallEncoder(nn.Module):
    """Encoder half of UNetSmall with a pooled scalar head — the
    time-DEPENDENT value network option (reference unet_small.py:336-443)."""

    ch: int = 128
    out_ch: int = 1
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 32
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    quant_int8: bool = False
    fuse_gn_conv: bool = False
    # attention implementation: see AttnBlock.attn_impl
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        assert x.shape[1] == x.shape[2] == self.resolution
        num_resolutions = len(self.ch_mult)
        temb_ch = self.ch * 4

        temb = timestep_embedding(t, self.ch)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense0")(temb.astype(self.dtype))
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="temb_dense1")(swish(temb))

        x = x.astype(self.dtype)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution

        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                                name=f"down_{i_level}_block_{i_block}")(
                    h, temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, softmax_f32=self.softmax_f32, quant=self.quant_int8, attn_impl=self.attn_impl,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_resolutions - 1:
                h = Downsample(self.resamp_with_conv, dtype=self.dtype, quant=self.quant_int8,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                        name="mid_block_1")(h, temb, deterministic=deterministic)
        h = AttnBlock(dtype=self.dtype, softmax_f32=self.softmax_f32, quant=self.quant_int8, attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, quant=self.quant_int8, fuse_gn_conv=self.fuse_gn_conv,
                        name="mid_block_2")(h, temb, deterministic=deterministic)

        # head: GN -> SiLU -> global average pool -> 1x1 conv -> flatten
        # (reference uses default-eps GroupNorm here, unet_small.py:405-411)
        h = h.astype(jnp.float32)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="out_norm")(h)
        h = jax.nn.silu(h)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)
        h = nn.Conv(self.out_ch, (1, 1), dtype=jnp.float32, name="out_conv")(h)
        return h.reshape(h.shape[0], -1)
