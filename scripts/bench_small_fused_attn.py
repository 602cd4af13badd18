"""On-chip A/B: UNetSmall attn_impl='fused' (whole-block Pallas kernel,
single-head d=C=256) vs the einsum path at the bench.py shape
(const-baked bf16, T=10, batch 64x64).

    python scripts/bench_small_fused_attn.py
"""
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


def run(tag, attn_impl, batch=64, nb=64, reps=2):
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                    attn_resolutions=(16,), dropout=0.0, in_channels=3,
                    resolution=32, dtype=jnp.bfloat16, softmax_f32=False,
                    attn_impl=attn_impl)
    s = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                   trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    gen = jax.jit(lambda k: sample_many(s, params, k, nb, batch))
    key = jax.random.key(1)
    jax.block_until_ready(gen(key))
    jax.block_until_ready(gen(jax.random.key(2)))     # ramp
    ks = [jax.random.fold_in(key, 10 + i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:24s} b{batch}x{nb}: {batch*nb*reps/dt:8.1f} img/s",
          flush=True)


run("einsum (baseline)", "einsum")
run("fused block", "fused")
run("einsum (recheck)", "einsum")
run("fused block b96", "fused", batch=96, nb=48)
