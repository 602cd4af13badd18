"""A/B the stock Pallas TPU flash-attention kernel vs the XLA einsum
attention at ADM shapes (ImageNet64: S=1024/256, d=64; LSUN: S=1024@ds16).

Standalone microbench — runs the attention op alone, serialized
dispatches, steady-state window (PERF.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

print("backend:", jax.default_backend(), jax.devices()[0].platform, flush=True)


def xla_attn(q, k, v, scale):
    # matches AttentionBlockADM einsum pair, bf16 softmax
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.bfloat16)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def fa(q, k, v, scale):
    return flash_attention(q, k, v, sm_scale=scale * scale)


CASES = [
    # (tag, B, nh, S, d)  — ImageNet64 batch-8 sampling shapes
    ("i64 ds2 S=1024 nh6 d64 B8", 8, 6, 1024, 64),
    ("i64 ds4 S=256  nh6 d64 B8", 8, 6, 256, 64),
    ("lsun ds16 S=256 nh?? d64 B8", 8, 16, 256, 64),
    ("i64 ds2 B16", 16, 6, 1024, 64),
]

for tag, B, nh, S, d in CASES:
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, nh, S, d), jnp.bfloat16)
    k = jax.random.normal(kk, (B, nh, S, d), jnp.bfloat16)
    v = jax.random.normal(kv, (B, nh, S, d), jnp.bfloat16)
    scale = 1.0 / (d ** 0.25)
    for name, fn in [("xla", xla_attn), ("flash", fa)]:
        try:
            # axon tunnel: block_until_ready does not truly block — time a
            # DEPENDENCY-CHAINED scan inside one dispatch, sync via host fetch
            reps = 100

            def chained(q, fn=fn):
                def body(qc, _):
                    return fn(qc, k, v, scale), ()
                out, _ = jax.lax.scan(body, q, None, length=reps)
                return out

            jf = jax.jit(chained)
            import numpy as np
            np.asarray(jf(q))  # compile + warm
            np.asarray(jf(q))
            t0 = time.perf_counter()
            np.asarray(jf(q))
            dt = (time.perf_counter() - t0) / reps
            print(f"{tag:32s} {name:5s}: {dt*1e6:8.1f} us/call", flush=True)
        except Exception as e:
            print(f"{tag:32s} {name:5s}: FAILED {type(e).__name__}: {e}",
                  flush=True)

# numeric agreement at one shape
q = jax.random.normal(jax.random.key(1), (2, 6, 256, 64), jnp.bfloat16)
k = jax.random.normal(jax.random.key(2), (2, 6, 256, 64), jnp.bfloat16)
v = jax.random.normal(jax.random.key(3), (2, 6, 256, 64), jnp.bfloat16)
scale = 1.0 / (64 ** 0.25)
a = jax.jit(lambda q, k, v: xla_attn(q, k, v, scale))(q, k, v)
b = jax.jit(lambda q, k, v: fa(q, k, v, scale))(q, k, v)
import numpy as np
a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
print("rel err:", np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8), flush=True)
