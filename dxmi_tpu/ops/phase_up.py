"""Phase-decomposed ``conv3x3(nearest_up2(x))`` — the decoder upsample
hot path of both U-Net families, computed WITHOUT materializing the
4x-inflated intermediate.

Since ``u[2i+a, 2j+b] = x[i, j]``, each output phase (a, b) of a SAME-
padded 3x3 conv over u touches only a 2x2 neighborhood of x with
phase-specific tap sums:

    a=0 rows: x offsets {-1, 0} with taps [W0, W1+W2]
    a=1 rows: x offsets {0, +1} with taps [W0+W1, W2]

(identically along columns), so the op is FOUR dense 2x2 convs on the
SMALL grid + a pixel-shuffle interleave: ``16*H*W*C_in*C_out`` MACs vs
the naive ``36``, and the (2H, 2W, C) nearest-resize tensor never hits
HBM. Exact in real arithmetic (fp reassociation of tap sums only);
zero padding on the upsampled grid maps exactly to zero padding on x.

Reference ops being matched: /root/reference/models/DxMI/
unet_small.py:51-66 (Upsample) and /root/reference/models/cm/
unet.py:79-100,147-260 (Upsample / ResBlock h_upd).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_PADS = {0: (1, 0), 1: (0, 1)}


def _phase_kernels(k: jnp.ndarray):
    """(3, 3, C_in, C_out) fp kernel -> four (2, 2, C_in, C_out) phase
    kernels in (a, b) = (0,0), (0,1), (1,0), (1,1) order."""
    rows = (jnp.stack([k[0], k[1] + k[2]]),           # a=0: offsets -1,0
            jnp.stack([k[0] + k[1], k[2]]))           # a=1: offsets 0,+1
    out = []
    for a in (0, 1):
        kr = rows[a]
        out.append(jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1))
        out.append(jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1))
    return out


def conv3x3_nearest_up2(x: jnp.ndarray, kernel: jnp.ndarray,
                        bias: Optional[jnp.ndarray], dtype,
                        act_scale: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """``conv3x3_same(nearest_up2(x), kernel) + bias`` via the phase
    decomposition. ``act_scale`` (C_in,) switches the four phase convs
    to the calibrated W8A8 int8 path (ops/quant.int8_conv_static); the
    nearest-repeat preserves per-channel activation quantiles, so a
    scale calibrated on x is exactly the scale of the upsampled map."""
    from dxmi_tpu.ops.quant import int8_conv_static

    B, H, W, C = x.shape
    ks = _phase_kernels(kernel.astype(jnp.float32))
    ys = []
    for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        pad = (_PADS[a], _PADS[b])
        if act_scale is not None:
            y = int8_conv_static(x, ks[i], None, act_scale, (1, 1), pad,
                                 out_dtype=dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, ks[i].astype(dtype), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ys.append(y)
    # interleave: out[2i+a, 2j+b] = ys[2a+b][i, j]
    t = jnp.stack(ys, axis=3).reshape(B, H, W, 2, 2, -1)
    out = t.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, t.shape[-1])
    if bias is not None:
        out = out + bias.astype(dtype)
    return out
