"""Inception FID-extraction throughput: fp32 vs bf16-cast params.

Timing: dependency-chained lax.scan inside one dispatch + host fetch
(axon tunnel: block_until_ready does not truly block — PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params

inc = InceptionV3FID()
p32 = random_fid_inception_params(jax.random.key(1))
p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)

BATCH, CHUNKS = 64, 16
x = jax.random.uniform(jax.random.key(2), (CHUNKS, BATCH, 32, 32, 3))


def ext32(p, xs):
    return jax.lax.map(lambda b: inc.apply({"params": p}, b), xs)


def ext16(p, xs):
    return jax.lax.map(
        lambda b: inc.apply({"params": p}, b.astype(jnp.bfloat16)).astype(jnp.float32),
        xs)


for tag, fn, p in [("fp32", ext32, p32), ("bf16", ext16, p16)]:
    reps = 4

    @jax.jit
    def chained(xs, p=p, fn=fn):
        # fold the previous activations back into the input so the scan
        # iterations are data-dependent (can't overlap / be elided)
        def body(carry, _):
            acts = fn(p, xs + carry * 1e-12)
            return jnp.mean(acts), acts
        _, all_acts = jax.lax.scan(body, 0.0, None, length=reps)
        return all_acts[-1]

    np.asarray(chained(x))
    np.asarray(chained(x))
    t0 = time.perf_counter()
    out = np.asarray(chained(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"inception {tag}: {CHUNKS*BATCH/dt:8.1f} img/s", flush=True)

a = np.asarray(ext32(p32, x)).reshape(-1, 2048)
b = np.asarray(ext16(p16, x)).reshape(-1, 2048)
print(f"activation drift: {np.abs(a-b).mean()/(np.abs(a).mean()+1e-8):.4f}",
      flush=True)
