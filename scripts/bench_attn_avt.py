"""A/B the transposed-AV attention-core formulations (DXMI_FUSED_AVT)
in the fused attention kernels at the ImageNet64 map shapes.

Motivation: scripts/bench_mxu_k64.py (round 5) — the row-path AV matmul
(S,S)@(S,64) pads the MXU's 128 output lanes and measured 2.6x slower
than the same MACs in transposed (64,S)@(S,S) form; the logits K=64
contraction is pass-quantized (K=64 costs the same as K=128) but has no
head-preserving fix.  avt=1/2 recover the AV half.

Serialized-dispatch chain methodology (axon block_until_ready caveat).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import dxmi_tpu.ops.attn_block as ab


def timeit(fn, x, reps=100):
    def chained(xc):
        def body(c, _):
            return fn(c), ()
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


os.environ.setdefault("DXMI_FUSED_NOMAX", "1")   # production sampling set

SWEEP = [(a, q) for a in ("0", "1", "2") for q in ("256",)]
if os.environ.get("DXMI_AVT_QB_SWEEP") == "1":
    # round-2 probe: with qb=S the avt=2 AV becomes the EXACT canonical
    # (64,S)@(S,S) shape the MXU micro measured 2.6x faster
    SWEEP = [("0", "256"), ("0", "512"), ("0", "1024"),
             ("2", "1024"), ("2", "512"), ("1", "1024")]

for B, S, C, nh in [(8, 1024, 384, 6), (8, 256, 576, 9), (16, 256, 256, 1)]:
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (B, S, C), jnp.bfloat16)
    gs = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    gb = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    wq = jax.random.normal(ks[3], (C, 3 * C), jnp.float32) / np.sqrt(C)
    bq = 0.02 * jax.random.normal(ks[4], (3 * C,), jnp.float32)
    wp = jax.random.normal(ks[5], (C, C), jnp.float32) / np.sqrt(C)
    bp = 0.02 * jax.random.normal(ks[6], (C,), jnp.float32)
    sa_q = jnp.full((C,), 0.03, jnp.float32)
    sa_p = jnp.full((C,), 0.02, jnp.float32)

    for avt, qb in SWEEP:
        os.environ["DXMI_FUSED_AVT"] = avt
        os.environ["DXMI_FUSED_QB"] = qb
        ab._make_op.cache_clear()
        ab._make_op_i8.cache_clear()

        def f_fp(xc):
            return ab.fused_attn_block(xc, gs, gb, wq, bq, wp, bp,
                                       num_heads=nh)
        def f_i8(xc):
            return ab.fused_attn_block_int8(xc, gs, gb, wq, bq, wp, bp,
                                            sa_q, sa_p, num_heads=nh)
        try:
            t_fp = timeit(f_fp, x)
            t_i8 = timeit(f_i8, x)
            print(f"B{B} S{S} C{C} nh{nh} avt={avt} qb={qb}: "
                  f"fp {t_fp*1e3:7.3f} ms   i8 {t_i8*1e3:7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"B{B} S{S} C{C} nh{nh} avt={avt} qb={qb}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
