"""Block-size sweep for the Pallas flash-attention kernel at ADM shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention)


def timeit(fn, q, reps=100):
    def chained(q):
        def body(qc, _):
            return fn(qc), ()
        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out
    jf = jax.jit(chained)
    np.asarray(jf(q)); np.asarray(jf(q))
    t0 = time.perf_counter()
    np.asarray(jf(q))
    return (time.perf_counter() - t0) / reps


for B, nh, S, d in [(8, 6, 1024, 64), (16, 6, 1024, 64), (8, 6, 256, 64)]:
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, nh, S, d), jnp.bfloat16)
    k = jax.random.normal(kk, (B, nh, S, d), jnp.bfloat16)
    v = jax.random.normal(kv, (B, nh, S, d), jnp.bfloat16)
    scale = 1.0 / (64.0 ** 0.5)

    def xla_attn(qc):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qc * scale, k,
                            preferred_element_type=jnp.bfloat16)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    dt = timeit(xla_attn, q)
    print(f"B{B} nh{nh} S{S}: xla                       {dt*1e6:8.1f} us",
          flush=True)

    for bq, bk, bb in [(128, 128, 1), (256, S, 1), (512, S, 1), (S, S, 1),
                       (S, S, 2), (S, S, B), (512, S, 2), (256, 256, 1)]:
        if bq > S or bk > S or bb > B:
            continue
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
        try:
            fn = lambda qc, bs=bs: flash_attention(
                qc, k, v, sm_scale=scale, block_sizes=bs)
            dt = timeit(fn, q)
            print(f"B{B} nh{nh} S{S}: flash bq{bq} bk{bk} bb{bb}  "
                  f"{dt*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"B{B} nh{nh} S{S}: flash bq{bq} bk{bk} bb{bb}  FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
