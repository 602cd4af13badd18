"""On-chip A/B: int8-static sampling with params as jit arguments vs
params baked as jit constants (XLA constant-folds the per-call weight
quantization and pre-lays-out weights), plus bf16 controls.

Usage: timeout 1800 python scripts/bench_quant_ab.py
"""
from __future__ import annotations

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


def make(quant):
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                    attn_resolutions=(16,), dropout=0.0, in_channels=3,
                    resolution=32, dtype=jnp.bfloat16, softmax_f32=False,
                    quant_int8=quant)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    return sampler


def run(tag, gen, params, key):
    out = gen(params, key) if params is not None else gen(key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        k = jax.random.fold_in(key, i)
        out = gen(params, k) if params is not None else gen(k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = BATCH * NB * REPS / dt
    print(f"{tag:40s} {ips:8.1f} img/s", flush=True)
    return ips


def main():
    key = jax.random.key(1)

    # --- bf16 ---
    s = make(False)
    params = s.init_params(jax.random.key(0))
    gen = jax.jit(lambda p, k: sample_many(s, p, k, NB, BATCH))
    run("bf16 (params as args)", gen, params, key)
    genc = jax.jit(lambda k: sample_many(s, params, k, NB, BATCH))
    run("bf16 (params baked const)", genc, None, key)

    # --- int8 static, per-input-channel scales (current default) ---
    sq = make("static")
    qparams = sq.init_params(jax.random.key(0))
    qparams = sq.calibrate_quant(qparams, jax.random.key(2), n_sample=64,
                                 n_rounds=2)
    genq = jax.jit(lambda p, k: sample_many(sq, p, k, NB, BATCH))
    run("int8 static (params as args)", genq, qparams, key)
    genqc = jax.jit(lambda k: sample_many(sq, qparams, k, NB, BATCH))
    run("int8 static (params baked const)", genqc, None, key)


if __name__ == "__main__":
    main()
