"""Round-3 parametric probe: shape x flags at the nomax bench point.

One probe per PROCESS (XLA/libtpu flags must precede backend init):
  python scripts/bench_r3_probe.py --batch 96 --nb 64 [--reps 8]
      [--no-nomax] [--libtpu "--xla_tpu_..."] [--tag name]

Measures the exact bench.py program shape (const-baked params, int8
static + quant_skip_attn + bf16_onepass GN + einsum_merged + nomax
softmax, host-fetched witness close).
"""
import argparse
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=96)
p.add_argument("--nb", type=int, default=64)
p.add_argument("--reps", type=int, default=8)
p.add_argument("--no-nomax", action="store_true")
p.add_argument("--up", default="resize", choices=["resize", "phase"])
p.add_argument("--libtpu", default="")
p.add_argument("--tag", default="")
args = p.parse_args()

if args.libtpu:
    os.environ["LIBTPU_INIT_ARGS"] = args.libtpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp


def main():
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler

    tag = args.tag or (f"b{args.batch}x{args.nb}r{args.reps}"
                       + ("" if args.no_nomax else "+nomax")
                       + ("" if args.up == "resize" else "+upphase")
                       + (f" [{args.libtpu}]" if args.libtpu else ""))
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                    in_channels=3, resolution=32, dtype=jnp.bfloat16,
                    softmax_f32=False, attn_impl="einsum_merged",
                    softmax_nomax=not args.no_nomax, up_impl=args.up,
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
    print(f"{tag:60s} {args.batch*args.nb*args.reps/dt:7.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
