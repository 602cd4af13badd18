"""Int8 (W8A8) convolution for quantized sampling.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), and PERF.md's
roofline shows the 2,000 img/s sampling target exceeds the bf16 ceiling
for the CIFAR U-Net — int8 is the only route. This implements
post-training dynamic quantization a la Q-Diffusion:

  * weights: per-output-channel symmetric int8 (scales from |w|max),
  * activations: per-tensor dynamic symmetric int8,
  * conv accumulates in int32 on the MXU, dequantizes into the compute
    dtype epilogue (bias add stays fp).

Inference-only (sampling); training always runs bf16/fp32 — the params
stay fp32, quantization happens in-graph (XLA constant-folds the weight
quantization only if params are baked; with runtime params it's a cheap
per-call elementwise pass over the small weight tensors).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Calibration range statistic: 1.0 = per-channel max; < 1.0 clips range
# outliers, Q-Diffusion-style (set before running calibrate_quant).
# Default 0.995 from the measured drift sweep
# (scripts/bench_calib_quantile.py, perturbed-init CIFAR T=10 probe):
# end-to-end sample drift 0.1725 (max) -> 0.1413 (0.999) -> 0.1265
# (0.995) -> 0.1255 (0.99) — 0.995 sits at the plateau with the least
# clipping.
CALIB_QUANTILE: float = 0.995


def quantize_per_channel(w: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO kernel -> (int8 kernel, per-out-channel scale)."""
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    wmax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.maximum(wmax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_per_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)
    return x_i8, scale


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias, strides=(1, 1),
              padding: Any = ((1, 1), (1, 1)), out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """W8A8 conv with int32 accumulation; x NHWC, kernel HWIO fp."""
    k_i8, wscale = quantize_per_channel(kernel, axis=-1)
    x_i8, ascale = quantize_per_tensor(x)
    acc = jax.lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (ascale * wscale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_conv_static(x, kernel, bias, act_scale, strides=(1, 1),
                     padding: Any = ((1, 1), (1, 1)),
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """W8A8 conv with CALIBRATED activation scales: no per-call range
    reduction — the quantize is pure elementwise and fuses into the
    producing op's epilogue.

    ``act_scale`` may be a scalar (per-tensor) or a (C_in,) vector:
    per-INPUT-channel activation scales fold exactly into the kernel's
    input axis (y = conv(x/s_c, k * s_c)) — better accuracy at zero
    runtime cost."""
    act_scale = jnp.asarray(act_scale, jnp.float32)
    if act_scale.ndim == 1:
        kernel = kernel * act_scale.reshape(1, 1, -1, 1)
        inv = 1.0 / act_scale
        x_q = x.astype(jnp.float32) * inv
        out_scale = 1.0
    else:
        x_q = x.astype(jnp.float32) / act_scale
        out_scale = act_scale
    k_i8, wscale = quantize_per_channel(kernel, axis=-1)
    x_i8 = jnp.clip(jnp.round(x_q), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (out_scale * wscale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_matmul_static(x: jnp.ndarray, w: jnp.ndarray, bias,
                       act_scale: jnp.ndarray,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """W8A8 matmul with calibrated per-input-channel activation scales:
    ``x`` (..., C_in) @ ``w`` (C_in, C_out) accumulating int32 on the MXU.

    Same math as :func:`int8_conv_static` for a 1x1 conv — the activation
    scales fold into the kernel's input axis, weights are per-output-
    channel symmetric int8. Used by the merged-qkv attention path
    (models/unet_small.py AttnBlock 'einsum_merged' under quant='static')
    so the q/k/v projections run as ONE int8 matmul."""
    act_scale = jnp.asarray(act_scale, jnp.float32)
    w = w.astype(jnp.float32) * act_scale[:, None]
    k_i8, wscale = quantize_per_channel(w, axis=-1)     # wscale (1, C_out)
    x_q = x.astype(jnp.float32) * (1.0 / act_scale)
    x_i8 = jnp.clip(jnp.round(x_q), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, k_i8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * wscale.reshape((1,) * (x.ndim - 1) + (-1,))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def calib_channel_scale(x2d: jnp.ndarray) -> jnp.ndarray:
    """Per-input-channel activation scale from a calibration batch
    ((N, C) |x| rows): CALIB_QUANTILE percentile / 127, floored."""
    xf = jnp.abs(x2d.astype(jnp.float32))
    if CALIB_QUANTILE >= 1.0:
        amax = jnp.max(xf, axis=0)
    else:
        amax = jnp.quantile(xf, CALIB_QUANTILE, axis=0)
    return jnp.maximum(amax / 127.0, 1e-8)


class QConv(nn.Module):
    """Drop-in conv with the same parameter tree as nn.Conv ('kernel',
    'bias') that runs W8A8 on the MXU.

    Activation-scale modes:
      * ``static_act=False`` — dynamic per-tensor quantization each call.
      * ``static_act=True``  — uses the calibrated ``act_scale`` from the
        'quant_scales' variable collection. Calibrate by applying the
        model with ``mutable=['quant_scales']`` on representative inputs
        (forward stays full-precision during calibration; each QConv
        records the running max |x| / 127).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    static_act: bool = False
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init or nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))

        if self.static_act:
            c_in = x.shape[-1]
            scale_var = self.variable("quant_scales", "act_scale",
                                      lambda: jnp.zeros((c_in,), jnp.float32))
            if self.is_mutable_collection("quant_scales"):
                # calibration pass: record PER-INPUT-CHANNEL ranges
                # (fold into the kernel at inference), run full precision.
                # Range statistic: calib_channel_scale (CALIB_QUANTILE
                # percentile, Q-Diffusion-style outlier clipping).
                scale_var.value = jnp.maximum(
                    scale_var.value,
                    calib_channel_scale(x.reshape(-1, x.shape[-1])))
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    self.strides, pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y + bias.astype(self.dtype) if bias is not None else y
            return int8_conv_static(x, kernel, bias, scale_var.value,
                                    self.strides, pad, out_dtype=self.dtype)

        return int8_conv(x, kernel, bias, self.strides, pad,
                         out_dtype=self.dtype)
