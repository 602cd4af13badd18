"""A/B the einsum_merged qkv attention at the current int8 operating
point (int8 static + quant_skip_attn + DXMI_GN_STATS=bf16_onepass).

The gap2 decomposition says attention still costs ~14% (309 img/s) at
the 1927 point even with quant_skip_attn; einsum_merged reads the
normed map once and runs q/k/v as ONE (C,3C) matmul — exact numerics,
checkpoint-compatible params (models/unet_small.py:239-248).

Run on chip: python scripts/bench_attn_merged.py [tags...]
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


def run(tag, net_kwargs=None, batch=96, nb=48):
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    try:
        kw = dict(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                  num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                  in_channels=3, resolution=32, dtype=jnp.bfloat16,
                  softmax_f32=False, quant_int8="static",
                  quant_skip_attn=True)
        kw.update(net_kwargs or {})
        net = UNetSmall(**kw)
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
        os.environ.pop("DXMI_GN_STATS", None)


def main():
    want = set(sys.argv[1:])

    def on(tag):
        return not want or any(w in tag for w in want)

    if on("base_96x48"):
        run("einsum baseline 96x48 (reproduce 1927)")
    if on("merged_96x48"):
        run("einsum_merged 96x48", {"attn_impl": "einsum_merged"})
    if on("base_96x64"):
        run("einsum baseline 96x64", batch=96, nb=64)
    if on("merged_96x64"):
        run("einsum_merged 96x64", {"attn_impl": "einsum_merged"},
            batch=96, nb=64)
    if on("folded_96x48"):
        run("einsum_folded 96x48", {"attn_impl": "einsum_folded"})
    if on("folded_96x64"):
        run("einsum_folded 96x64", {"attn_impl": "einsum_folded"},
            batch=96, nb=64)
    if on("folded_128x48"):
        run("einsum_folded 128x48", {"attn_impl": "einsum_folded"},
            batch=128, nb=48)
    # int8-quantized merged qkv (+ int8 proj_out): quant_skip_attn OFF
    if on("qmerged_96x48"):
        run("int8 merged qkv 96x48",
            {"attn_impl": "einsum_merged", "quant_skip_attn": False})
    if on("qmerged_96x64"):
        run("int8 merged qkv 96x64",
            {"attn_impl": "einsum_merged", "quant_skip_attn": False},
            batch=96, nb=64)


if __name__ == "__main__":
    main()
