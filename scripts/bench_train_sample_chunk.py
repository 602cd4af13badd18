"""On-chip: the CIFAR train step samples its trajectory at the global
batch (128) in one go; the const-baked shape sweep said batch 64 is the
throughput optimum. Same total images per dispatch, params passed as
jit ARGUMENTS (the training regime — params change every step):

  128 x 8  vs  64 x 16  vs  96 x ~11  vs 32 x 32

If 64-chunks win, the trainer's sampling phase should scan 2 chunks of
64 instead of one 128 batch.

    python scripts/bench_train_sample_chunk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                attn_resolutions=(16,), dropout=0.0, in_channels=3,
                resolution=32, dtype=jnp.bfloat16, softmax_f32=False)
s = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
               trainable_beta="fix_last")
params = s.init_params(jax.random.key(0))
key = jax.random.key(1)

for batch, nb in [(128, 8), (64, 16), (96, 11), (32, 32), (128, 8)]:
    gen = jax.jit(lambda p, k, b=batch, n=nb: sample_many(s, p, k, n, b))
    jax.block_until_ready(gen(params, key))
    jax.block_until_ready(gen(params, jax.random.key(2)))
    ks = [jax.random.fold_in(key, 10 + i) for i in range(3)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(params, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = batch * nb * 3 / dt
    print(f"batch={batch:4d} x {nb:3d}: {rate:8.1f} img/s "
          f"({128.0 / rate * 1000:6.1f} ms per 128 images)", flush=True)
