"""3x3 conv as 9 shifted matmuls ("taps" formulation).

XLA's ConvGeneralDilated at the CIFAR hot shape (B=64, 32x32, C=128,
bf16) runs measurably slower than expressing the same conv as nine
shifted (B*H*W, Cin) @ (Cin, Cout) matmuls accumulated in registers —
the MXU sees one flattened 1024-row GEMM per tap instead of XLA's
2-D spatial tiling (scripts/bench_conv_formulations.py: -35% standalone
at 32x32 c128; parity at 16x16 c256 / ADM shapes).

``Conv3x3Taps`` is parameter-compatible with ``nn.Conv(features, (3,3),
padding=1)`` — same param names (kernel: HWIO, bias), same init — so
checkpoints and converters are oblivious to which implementation runs.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Conv3x3Taps(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, Cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, Cin, self.features))
        k = kernel.astype(self.dtype)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, dy:dy + H, dx:dx + W, :]
                t = jnp.einsum("bhwc,cd->bhwd", sl, k[dy, dx],
                               preferred_element_type=self.dtype)
                out = t if out is None else out + t
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(self.dtype)
        return out
