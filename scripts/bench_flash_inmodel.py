"""In-model A/B: ADM attention einsum (bf16 softmax, current best) vs
the Pallas flash kernel — ImageNet64 EDM T=10 sampling on-chip.

    python scripts/bench_flash_inmodel.py [--model imagenet64|lsun]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

from bench_edm_sweep import CONFIGS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=list(CONFIGS), default="imagenet64")
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--batches", type=int, nargs="*", default=None)
    args = p.parse_args()
    cfg = CONFIGS[args.model]
    batches = args.batches or [8, 16]

    params = None
    for impl in (os.environ.get("DXMI_AB_IMPLS", "einsum,flash").split(",")):
        net, diffusion = create_model_and_diffusion(
            **cfg["diffusion"], dtype=jnp.bfloat16, softmax_f32=False,
            attn_impl=impl)
        sampler = EDMSampler(net, diffusion, **cfg["sampler"])
        if params is None:
            params = sampler.init_params(jax.random.key(0))
        key = jax.random.key(1)
        for batch in batches:
            nb = max(args.images // batch, 1)
            gen = jax.jit(lambda p, k, b=batch, n=nb:
                          sample_many(sampler, p, k, n, b))
            jax.block_until_ready(gen(params, key))
            jax.block_until_ready(gen(params, jax.random.key(2)))
            reps = 2
            ks = [jax.random.fold_in(key, 10 + i) for i in range(reps)]
            jax.block_until_ready(ks)
            t0 = time.perf_counter()
            for k in ks:
                out = gen(params, k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            print(f"{impl:6s} batch={batch:3d} x{nb:3d}  "
                  f"{batch*nb*reps/dt:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
