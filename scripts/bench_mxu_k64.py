"""MXU efficiency micro-probe for the d=64 attention-core question
(VERDICT r4 task 1 / round-5 lever map).

The fused attention kernel's per-head matmuls at the ImageNet64 ds2 map
are (256,64)@(64,1024) logits (contraction K=d=64) and
(1024,1024)@(1024,64) AV (output N=d=64).  If the MXU pass count is
quantized to 128-wide tiles, K=64 runs at ~50% utilization and N=64
wastes half the output lanes — and the fix-by-layout (transposed-AV)
becomes worth implementing in-kernel.  If instead time scales ~linearly
in K (resp. N) down to 64, there is no waste and the lever is void.

This measures XLA-lowered dot_generals (Mosaic inside the Pallas kernel
obeys the same MXU tiling rules) with the serialized-dispatch chain
methodology (axon block_until_ready caveat, CLAUDE.md); the chain
carries a scalar mean of each product back into the input so dispatches
serialize while the chain op stays negligible next to the matmul.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def timeit(make_fn, x, reps=200):
    fn = make_fn

    def chained(xc):
        def body(c, _):
            o = fn(c)
            return c + (o * 1e-6).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out
    jf = jax.jit(chained)
    np.asarray(jf(x)); np.asarray(jf(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(x))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


key = jax.random.key(0)

print("== contraction-K sweep: (1024,K)@(K,1024) bf16, fp32 acc ==",
      flush=True)
base = None
for K in [64, 128, 256, 384, 512]:
    a = jax.random.normal(key, (1024, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, 1024), jnp.bfloat16)

    def f(a, b=b):
        o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o.mean()
    dt = timeit(f, a)
    note = "" if base is None else f"  x{dt/base:.2f} vs K=64"
    if base is None:
        base = dt
    print(f"K={K:4d}: {dt*1e6:8.1f} us{note}", flush=True)

print("== output-N sweep: (1024,1024)@(1024,N) bf16 ==", flush=True)
base = None
for N in [64, 128, 256, 384]:
    a = jax.random.normal(key, (1024, 1024), jnp.bfloat16)
    b = jax.random.normal(key, (1024, N), jnp.bfloat16)

    def f(a, b=b):
        o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o.mean()
    dt = timeit(f, a)
    note = "" if base is None else f"  x{dt/base:.2f} vs N=64"
    if base is None:
        base = dt
    print(f"N={N:4d}: {dt*1e6:8.1f} us{note}", flush=True)

print("== transposed AV: (64,1024)@(1024,1024) (M=64, full K/N lanes) ==",
      flush=True)
a = jax.random.normal(key, (64, 1024), jnp.bfloat16)
b = jax.random.normal(key, (1024, 1024), jnp.bfloat16)

def f(a, b=b):
    o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.mean()
dt = timeit(f, a)
print(f"M=64 : {dt*1e6:8.1f} us  (same MACs as the N=64 row above)",
      flush=True)

print("== NT vs NN logits: (256,64) x (1024,64) contract d ==", flush=True)
q = jax.random.normal(key, (256, 64), jnp.bfloat16)
k = jax.random.normal(key, (1024, 64), jnp.bfloat16)
kt = jnp.asarray(np.asarray(k).T)                       # (64,1024)

def f_nt(q, k=k):
    o = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.mean()

def f_nn(q, kt=kt):
    o = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.mean()

print(f"NT (contract lane dims): {timeit(f_nt, q)*1e6:8.1f} us", flush=True)
print(f"NN (pre-transposed k):   {timeit(f_nn, q)*1e6:8.1f} us", flush=True)
