"""Capture a jax.profiler trace of flagship sampling (SURVEY.md §5: the
reference ships no tracing; this is the rebuild's hook).

    python scripts/profile_sampling.py --out /tmp/tb_trace [--batch 512]

View with TensorBoard's profile plugin on a machine that has it.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/dxmi_trace")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n_batches", type=int, default=4)
    args = p.parse_args()

    import jax

    if os.environ.get("DXMI_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])

    import jax.numpy as jnp

    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.utils.profiling import trace_if

    net = UNetSmall(dtype=jnp.bfloat16, softmax_f32=False)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    f = jax.jit(lambda p, k: sample_many(sampler, p, k, args.n_batches,
                                         args.batch))
    jax.block_until_ready(f(params, jax.random.key(1)))  # compile outside

    with trace_if(args.out):
        out = f(params, jax.random.key(2))
        jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
