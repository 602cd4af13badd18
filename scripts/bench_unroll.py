"""A/B the trajectory-scan and outer-batch-scan unroll factors at the
bench.py operating point (int8 static + quant_skip_attn + einsum_merged
+ DXMI_GN_STATS=bf16_onepass, 96x48).

lax.scan keeps the program small but serializes step boundaries;
unrolling lets XLA fuse/overlap across sampler steps (T=10 inner scan,
DXMI_SCAN_UNROLL) or across whole-batch sample() calls (48 outer scan,
DXMI_OUTER_UNROLL) at the cost of program size / compile time.

Run on chip: python scripts/bench_unroll.py [tags...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp


def run(tag, inner=1, outer=1, batch=96, nb=48):
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    os.environ["DXMI_SCAN_UNROLL"] = str(inner)
    os.environ["DXMI_OUTER_UNROLL"] = str(outer)
    try:
        from dxmi_tpu.models.unet_small import UNetSmall
        from dxmi_tpu.samplers import sample_many
        from dxmi_tpu.samplers.var import VARSampler

        net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                        num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                        in_channels=3, resolution=32, dtype=jnp.bfloat16,
                        softmax_f32=False, quant_int8="static",
                        quant_skip_attn=True, attn_impl="einsum_merged")
        sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                             trainable_beta="fix_last")
        params = sampler.init_params(jax.random.key(0))
        params = sampler.calibrate_quant(params, jax.random.key(3),
                                         n_sample=8, n_rounds=1)
        gen = jax.jit(lambda k: sample_many(sampler, params, k, nb, batch))
        key = jax.random.key(1)
        print(f"[{time.strftime('%H:%M:%S')}] {tag}: compiling...", flush=True)
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
        print(f"{tag:52s} {batch*nb*len(ks)/dt:7.1f} img/s", flush=True)
    finally:
        for v in ("DXMI_GN_STATS", "DXMI_SCAN_UNROLL", "DXMI_OUTER_UNROLL"):
            os.environ.pop(v, None)


def main():
    want = set(sys.argv[1:])

    def on(tag):
        return not want or any(w in tag for w in want)

    if on("inner1"):
        run("unroll inner=1 outer=1 (baseline)", 1, 1)
    if on("inner2"):
        run("unroll inner=2", 2, 1)
    if on("inner5"):
        run("unroll inner=5", 5, 1)
    if on("inner10"):
        run("unroll inner=10 (full)", 10, 1)
    if on("outer2"):
        run("unroll outer=2", 1, 2)
    if on("inner2outer2"):
        run("unroll inner=2 outer=2", 2, 2)


if __name__ == "__main__":
    main()
