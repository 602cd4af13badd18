"""Stability check: bf16 args vs baked-const, interleaved twice."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax

import jax.numpy as jnp

from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

BATCH, NB, REPS = 512, 8, 3

net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                attn_resolutions=(16,), dropout=0.0, in_channels=3,
                resolution=32, dtype=jnp.bfloat16, softmax_f32=False)
s = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
               trainable_beta="fix_last")
params = s.init_params(jax.random.key(0))
gen_args = jax.jit(lambda p, k: sample_many(s, p, k, NB, BATCH))
gen_const = jax.jit(lambda k: sample_many(s, params, k, NB, BATCH))

key = jax.random.key(1)
jax.block_until_ready(gen_args(params, key))
jax.block_until_ready(gen_const(key))

for rnd in range(3):
    for tag, fn in [("args", lambda k: gen_args(params, k)),
                    ("const", gen_const)]:
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(jax.random.fold_in(key, rnd * 100 + i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"round {rnd} {tag:6s} {BATCH*NB*REPS/dt:8.1f} img/s", flush=True)
