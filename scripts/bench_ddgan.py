import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax
import jax.numpy as jnp
from dxmi_tpu.models.ncsnpp import NCSNpp, NCSNppArgs
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.ddgan import DDGANSampler

net = NCSNpp(config=NCSNppArgs())
s = DDGANSampler(net, n_timesteps=4, sample_shape=(3, 32, 32),
                 trainable_beta="fix_last", use_z=True)
params = s.init_params(jax.random.key(0))
n = sum(a.size for a in jax.tree.leaves(params))
print(f"ddgan: {n/1e6:.1f}M params", flush=True)
key = jax.random.key(1)
for batch, nb in [(64, 8), (64, 64), (128, 32), (256, 16)]:
    gen = jax.jit(lambda k, b=batch, m=nb: sample_many(s, params, k, m, b))
    jax.block_until_ready(gen(key))
    jax.block_until_ready(gen(jax.random.key(2)))
    ks = [jax.random.fold_in(key, 10 + i) for i in range(3)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"batch={batch:4d} x{nb:3d} {batch*nb*3/dt:8.1f} img/s", flush=True)
