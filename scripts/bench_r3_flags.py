"""Round-3 probe #3: XLA-flag + window variants at the bench point.

One variant per PROCESS (XLA flags must precede backend init):
  python scripts/bench_r3_flags.py <variant>

Variants:
  bf16_concat   — bf16 (no int8) concat 96x64: comparator for the
                  split-bf16 1401 img/s row (bench_split_concat.py D)
  bf16_split    — split, same, re-run in this harness for a clean pair
  base          — int8 bench path (reproduction)
  vmem96        — + --xla_tpu_scoped_vmem_limit_kib=98304
  vmem128       — + --xla_tpu_scoped_vmem_limit_kib=131072
  big           — int8 bench path, reps=8, nb=128 (bigger honest window)
  nomax         — int8 bench path + softmax_nomax (exp/sum, no max pass)
  nomax_big     — nomax with the reps=8 window
"""
import os
import sys
import time

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"

if VARIANT == "vmem96":
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=98304"
elif VARIANT == "vmem128":
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=131072"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp


def main():
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler

    bf16 = VARIANT.startswith("bf16")
    kw = {} if bf16 else dict(quant_int8="static", quant_skip_attn=True)
    if VARIANT.startswith("nomax"):
        kw["softmax_nomax"] = True
    skip = "split" if VARIANT.endswith("split") else "concat"
    reps, nb = (8, 128) if VARIANT.endswith("big") else (3, 64)

    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                    in_channels=3, resolution=32, dtype=jnp.bfloat16,
                    softmax_f32=False, attn_impl="einsum_merged",
                    skip_concat=skip, **kw)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    if not bf16:
        params = sampler.calibrate_quant(params, jax.random.key(3),
                                         n_sample=8, n_rounds=1)
    batch = 96

    def prog(k):
        out = sample_many(sampler, params, k, nb, batch)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    print(f"[{time.strftime('%H:%M:%S')}] {VARIANT}: compiling...",
          flush=True)
    out, scal = gen(jax.random.key(1))
    float(scal)
    for i in range(4):
        out, scal = gen(jax.random.key(2 + i))
    float(scal)
    ks = [jax.random.key(100 + i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out, scal = gen(k)
    float(scal)
    dt = time.perf_counter() - t0
    print(f"{VARIANT:44s} {batch*nb*reps/dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
