"""Round-3 probe: batch-blocked fused attention (ops/attn_block._kernel_bb)
vs einsum_merged at the exact bench.py operating point.

The per-element fused kernel lost 6% to the XLA einsum path at the CIFAR
map shape (PERF.md round 2: 1800 vs 1910); the hypothesis here is that
grid=(B,) starved the MXU — (256,256) matmuls one batch element at a
time — and that blocking BB elements per program ((BB*256, 256) qkv rows)
recovers the fusion's saved HBM round-trips without the matmul penalty.

One probe per process:
  python scripts/bench_attn_bb.py --attn merged            # repro baseline
  python scripts/bench_attn_bb.py --attn fused --bb 8
"""
import argparse
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=96)
p.add_argument("--nb", type=int, default=64)
p.add_argument("--reps", type=int, default=8)
p.add_argument("--attn", default="fused",
               choices=["einsum", "einsum_merged", "merged", "fused"])
p.add_argument("--bb", type=int, default=1)
args = p.parse_args()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp


def main():
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    os.environ["DXMI_FUSED_ATTN_BB"] = str(args.bb)
    attn = "einsum_merged" if args.attn == "merged" else args.attn
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler

    tag = f"attn={attn} bb={args.bb} b{args.batch}x{args.nb}r{args.reps}"
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                    in_channels=3, resolution=32, dtype=jnp.bfloat16,
                    softmax_f32=False, attn_impl=attn,
                    softmax_nomax=True, up_impl="phase",
                    quant_int8="static", quant_skip_attn=True)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    params = sampler.calibrate_quant(params, jax.random.key(3),
                                     n_sample=8, n_rounds=1)

    def prog(k):
        out = sample_many(sampler, params, k, args.nb, args.batch)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: compiling...", flush=True)
    out, scal = gen(jax.random.key(1))
    float(scal)
    for i in range(4):
        out, scal = gen(jax.random.key(2 + i))
    float(scal)
    ks = [jax.random.key(100 + i) for i in range(args.reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out, scal = gen(k)
    float(scal)
    dt = time.perf_counter() - t0
    print(f"{tag:50s} {args.batch*args.nb*args.reps/dt:7.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
