"""Is XLA's ConvGeneralDilated the fastest way to run a 3x3 conv at
CIFAR shapes (B, 32, 32, 128)? A/B vs explicit im2col / 9-shifted-matmul
formulations that map straight onto the MXU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, reps=100):
    @jax.jit
    def chained(x):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    np.asarray(chained(x)); np.asarray(chained(x))
    t0 = time.perf_counter()
    np.asarray(chained(x))
    return (time.perf_counter() - t0) / reps


for B, H, C in [(64, 32, 128), (64, 16, 256), (8, 32, 384)]:
    x = jax.random.normal(jax.random.key(0), (B, H, H, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
    flops = B * H * H * C * C * 9 * 2

    def conv_xla(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def conv_taps(v):
        # 9 shifted matmuls accumulated: out[p] += x[p+dp] @ w[dp]
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = vp[:, dy:dy + H, dx:dx + H, :]
                t = jnp.einsum("bhwc,cd->bhwd", sl, w[dy, dx],
                               preferred_element_type=jnp.bfloat16)
                out = t if out is None else out + t
        return out

    def conv_im2col(v):
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [vp[:, dy:dy + H, dx:dx + H, :]
             for dy in range(3) for dx in range(3)], axis=-1)  # (B,H,W,9C)
        return jnp.einsum("bhwk,kd->bhwd", cols,
                          w.transpose(0, 1, 2, 3).reshape(9 * C, C),
                          preferred_element_type=jnp.bfloat16)

    # numeric check
    a = np.asarray(jax.jit(conv_xla)(x), np.float32)
    for name, fn in [("taps", conv_taps), ("im2col", conv_im2col)]:
        b = np.asarray(jax.jit(fn)(x), np.float32)
        err = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)
        assert err < 2e-2, (name, err)

    for name, fn in [("xla_conv", conv_xla), ("taps", conv_taps),
                     ("im2col", conv_im2col)]:
        dt = timeit(fn, x)
        print(f"B{B} {H}x{H} c{C}: {name:9s} {dt*1e6:8.1f} us  "
              f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
