"""Decompose FID Inception extraction cost on-chip: resize vs conv stack,
fp32 vs bf16. Chained-scan timing (axon methodology)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params

B = 64
p32 = random_fid_inception_params(jax.random.key(1))
p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
x = jax.random.uniform(jax.random.key(2), (B, 32, 32, 3))

inc_full = InceptionV3FID()
inc_nores = InceptionV3FID(resize_input=False)
x299 = jax.image.resize(x, (B, 299, 299, 3), method="bilinear")


def timed(tag, fn, xin, reps=8):
    @jax.jit
    def chained(xs):
        def body(c, _):
            out = fn(xs + c * 1e-20)
            return jnp.mean(out).astype(xs.dtype), out
        _, outs = jax.lax.scan(body, jnp.zeros((), xin.dtype), None,
                               length=reps)
        return outs[-1]

    np.asarray(chained(xin)); np.asarray(chained(xin))
    t0 = time.perf_counter()
    np.asarray(chained(xin))
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:28s}: {dt*1e3:8.1f} ms/batch{B} = {B/dt:7.1f} img/s",
          flush=True)


timed("resize only", lambda v: jax.image.resize(
    v, (B, 299, 299, 3), method="bilinear"), x)
timed("full fp32 (resize+net)", lambda v: inc_full.apply({"params": p32}, v), x)
timed("net only fp32 (299 in)", lambda v: inc_nores.apply({"params": p32}, v),
      x299)
timed("net only bf16 (299 in)",
      lambda v: inc_nores.apply({"params": p16}, v.astype(jnp.bfloat16)),
      x299.astype(jnp.bfloat16))
timed("full bf16", lambda v: inc_full.apply(
    {"params": p16}, v).astype(jnp.float32), x.astype(jnp.bfloat16))
