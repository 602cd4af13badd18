"""Does XLA:TPU run int8 convs on the int8 MXU (2x bf16 rate) or not?

Times pure convs at the CIFAR hot shape in bf16 vs int8 (int32 acc) vs
int8 via dot_general on the flattened im2col form. Bounds what a fused
Pallas int8 kernel could buy."""
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
            o = fn(c)
            # feed output back (cast to input dtype) to serialize
            return o.astype(x.dtype)[..., :x.shape[-1]], ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    np.asarray(chained(x)); np.asarray(chained(x))
    t0 = time.perf_counter()
    np.asarray(chained(x))
    return (time.perf_counter() - t0) / reps


for B, H, C in [(64, 32, 128), (64, 16, 256)]:
    flops = B * H * H * C * C * 9 * 2
    xb = jax.random.normal(jax.random.key(0), (B, H, H, C), jnp.bfloat16)
    wb = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05
    xi = jax.random.randint(jax.random.key(0), (B, H, H, C), -127, 127,
                            jnp.int8)
    wi = jax.random.randint(jax.random.key(1), (3, 3, C, C), -127, 127,
                            jnp.int8)

    def conv_bf16(v):
        return jax.lax.conv_general_dilated(
            v, wb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def conv_int8(v):
        return jax.lax.conv_general_dilated(
            v, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def matmul_bf16(v):
        # same-MAC probe: (B*H*H, C) @ (C, 9C) has the 3x3 conv's MACs
        o = v.reshape(-1, C) @ wb.reshape(9 * C, C)[:C, :].repeat(9, 1)
        return o.reshape(B, H, H, 9 * C)[..., :C] * 1.0 + o.reshape(
            B, H, H, 9 * C)[..., C:2 * C]

    def matmul_int8(v):
        o = jax.lax.dot_general(
            v.reshape(-1, C), wi.reshape(9 * C, C)[:C, :].repeat(9, 1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        o = o.reshape(B, H, H, 9 * C)
        return o[..., :C] + o[..., C:2 * C]

    for tag, fn, x in [("conv bf16", conv_bf16, xb),
                       ("conv int8->i32", conv_int8, xi),
                       ("mm bf16 (same MACs)", matmul_bf16, xb),
                       ("mm int8 (same MACs)", matmul_int8, xi)]:
        dt = timeit(fn, x)
        print(f"B{B} {H}x{H} c{C}: {tag:20s} {dt*1e6:8.1f} us  "
              f"{flops/dt/1e12:6.1f} T(FL)OP/s", flush=True)
