"""On-chip batch sweep for large-model EDM sampling (ImageNet64 / LSUN),
const-baked params, applying the CIFAR findings (PERF.md).

    python scripts/bench_edm_sweep.py --model imagenet64
    python scripts/bench_edm_sweep.py --model lsun
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax

import jax.numpy as jnp

from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

CONFIGS = {
    "imagenet64": dict(
        diffusion=dict(sigma_min=0.002, sigma_max=80.0, image_size=64,
                       num_channels=192, num_res_blocks=3, num_heads=4,
                       num_heads_upsample=-1, num_head_channels=64,
                       attention_resolutions="32,16,8", channel_mult="",
                       dropout=0.0, class_cond=True, use_checkpoint=False,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_fp16=False),
        sampler=dict(sample_shape=(3, 64, 64), n_timesteps=10,
                     class_cond=True, num_classes=1000,
                     trainable_beta="fix_last"),
        batches=[8, 16, 32, 64],
    ),
    "lsun": dict(
        diffusion=dict(sigma_min=0.002, sigma_max=80.0, image_size=256,
                       num_channels=256, num_res_blocks=2, num_heads=4,
                       num_heads_upsample=-1, num_head_channels=64,
                       attention_resolutions="32,16,8", channel_mult="",
                       dropout=0.0, class_cond=False, use_checkpoint=False,
                       use_scale_shift_norm=False, resblock_updown=True,
                       use_fp16=False),
        sampler=dict(sample_shape=(3, 256, 256), n_timesteps=4,
                     class_cond=False, num_classes=0,
                     trainable_beta="fix_last", rho=4.0,
                     stochastic_last=True),
        batches=[2, 4, 8, 16],
    ),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=list(CONFIGS), default="imagenet64")
    p.add_argument("--images", type=int, default=256,
                   help="images per timed window")
    args = p.parse_args()
    cfg = CONFIGS[args.model]

    net, diffusion = create_model_and_diffusion(**cfg["diffusion"],
                                                dtype=jnp.bfloat16)
    sampler = EDMSampler(net, diffusion, **cfg["sampler"])
    params = sampler.init_params(jax.random.key(0))
    n_params = sum(a.size for a in jax.tree.leaves(params))
    print(f"{args.model}: {n_params/1e6:.0f}M params", flush=True)
    key = jax.random.key(1)

    # NOTE: const-baking params is infeasible for these model sizes over
    # the remote-compile tunnel (HTTP 413: the HLO would embed >1 GB of
    # constants); params stay jit ARGUMENTS here.
    for batch in cfg["batches"]:
        nb = max(args.images // batch, 1)
        gen = jax.jit(lambda p, k, b=batch, n=nb:
                      sample_many(sampler, p, k, n, b))
        jax.block_until_ready(gen(params, key))        # compile
        jax.block_until_ready(gen(params, jax.random.key(2)))  # ramp
        reps = 2
        ks = [jax.random.fold_in(key, 10 + i) for i in range(reps)]
        jax.block_until_ready(ks)
        t0 = time.perf_counter()
        for k in ks:
            out = gen(params, k)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"batch={batch:3d} x{nb:3d}  {batch*nb*reps/dt:7.2f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
