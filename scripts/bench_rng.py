"""RNG ablation on the int8 bench path: threefry vs rbg vs no-noise bound.

The T=10 DDPM step draws (B,32,32,3) fp32 gaussians per step
(samplers/var.py:191). Threefry2x32 + erfinv runs on the VPU and is a
known TPU cost; jax's 'rbg' PRNG uses the hardware RNG instruction.
Bound row replaces noise with zeros (WRONG numerics, timing bound only).

Run on chip: python scripts/bench_rng.py
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

BATCH, NB = 96, 48


def build(gn_stats="bf16_onepass"):
    os.environ["DXMI_GN_STATS"] = gn_stats
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                    in_channels=3, resolution=32, dtype=jnp.bfloat16,
                    softmax_f32=False, quant_int8="static",
                    quant_skip_attn=True)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    params = sampler.calibrate_quant(params, jax.random.key(3),
                                     n_sample=8, n_rounds=1)
    return sampler, params


def time_gen(tag, gen, key):
    jax.block_until_ready(gen(key))
    for i in range(4):
        out = gen(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    ks = [jax.random.fold_in(key, 100 + i) for i in range(3)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:44s} {BATCH*NB*len(ks)/dt:7.1f} img/s", flush=True)


def main():
    sampler, params = build()
    gen = jax.jit(lambda k: sample_many(sampler, params, k, NB, BATCH))

    time_gen("threefry (baseline, reproduce 1927)", gen,
             jax.random.key(1))
    time_gen("rbg hardware PRNG", gen,
             jax.random.key(1, impl="rbg"))

    # bound: no gaussian generation at all (zeros) — WRONG numerics,
    # isolates the total threefry+erfinv cost at trace time
    real_normal = jax.random.normal
    try:
        jax.random.normal = lambda key, shape, dtype=jnp.float32: (
            jnp.zeros(shape, dtype))
        gen_bound = jax.jit(
            lambda k: sample_many(sampler, params, k, NB, BATCH))
        time_gen("no-noise BOUND (wrong numerics)", gen_bound,
                 jax.random.key(1))
    finally:
        jax.random.normal = real_normal


if __name__ == "__main__":
    main()
