"""DDGAN T=4 int8 (W8A8 static) vs bf16/fp sampling throughput A/B.

The T4_ddgan config is the repo's fastest CIFAR setting (PERF.md: 2,321
img/s/chip at batch 64x64 const-baked). The CIFAR UNetSmall gained +30%
from static int8 (MXU-bound at 32^2 shapes); the NCSN++ shares that
regime, so int8 should scale it similarly. Methodology: const-baked
params, serialized-dispatch scan windows, keys precomputed outside the
timed loop (PERF.md timing hygiene).
"""
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


def bench(tag, sampler, params, shapes):
    key = jax.random.key(1)
    for batch, nb in shapes:
        gen = jax.jit(lambda k, b=batch, m=nb: sample_many(sampler, params,
                                                           k, m, b))
        jax.block_until_ready(gen(key))
        for i in range(3):  # ramp
            out = gen(jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        ks = [jax.random.fold_in(key, 10 + i) for i in range(3)]
        jax.block_until_ready(ks)
        t0 = time.perf_counter()
        for k in ks:
            out = gen(k)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{tag} batch={batch:4d} x{nb:3d} "
              f"{batch * nb * 3 / dt:8.1f} img/s", flush=True)


def main():
    net_fp = NCSNpp(config=NCSNppArgs())
    s_fp = DDGANSampler(net_fp, n_timesteps=4, sample_shape=(3, 32, 32),
                        trainable_beta="fix_last", use_z=True)
    params = s_fp.init_params(jax.random.key(0))
    n = sum(a.size for a in jax.tree.leaves(params))
    print(f"ddgan: {n / 1e6:.1f}M params", flush=True)

    shapes = [(64, 64), (96, 48), (128, 32)]
    bench("fp  ", s_fp, params, shapes)

    if "--bf16" in sys.argv:
        # round-4: bf16 compute dtype (params fp32) — pairs with
        # DXMI_GN_STATS=bf16_onepass, which is inert on the fp32 torso
        net_bf = NCSNpp(config=NCSNppArgs(), dtype=jnp.bfloat16)
        s_bf = DDGANSampler(net_bf, n_timesteps=4, sample_shape=(3, 32, 32),
                            trainable_beta="fix_last", use_z=True)
        bench("bf16", s_bf, params, shapes)
        net_bq = NCSNpp(config=NCSNppArgs(), dtype=jnp.bfloat16,
                        quant_int8="static", quant_skip_attn=True)
        s_bq = DDGANSampler(net_bq, n_timesteps=4, sample_shape=(3, 32, 32),
                            trainable_beta="fix_last", use_z=True)
        bq_params = s_bq.calibrate_quant(dict(params), jax.random.key(5),
                                         n_sample=64, n_rounds=2)
        bench("bf16+int8 skip_attn", s_bq, bq_params, shapes)
        return

    net_q = NCSNpp(config=NCSNppArgs(), quant_int8="static")
    s_q = DDGANSampler(net_q, n_timesteps=4, sample_shape=(3, 32, 32),
                       trainable_beta="fix_last", use_z=True)
    q_params = s_q.calibrate_quant(dict(params), jax.random.key(5),
                                   n_sample=64, n_rounds=2)
    print("int8: calibrated", flush=True)
    bench("int8", s_q, q_params, shapes)

    # selective precision: attention 1x1 convs stay bf16
    net_sk = NCSNpp(config=NCSNppArgs(), quant_int8="static",
                    quant_skip_attn=True)
    s_sk = DDGANSampler(net_sk, n_timesteps=4, sample_shape=(3, 32, 32),
                        trainable_beta="fix_last", use_z=True)
    sk_params = s_sk.calibrate_quant(dict(params), jax.random.key(5),
                                     n_sample=64, n_rounds=2)
    bench("int8 skip_attn", s_sk, sk_params, shapes[:1])


if __name__ == "__main__":
    main()
