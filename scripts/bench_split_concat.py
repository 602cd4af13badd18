"""Split-concat decoder A/B at the bench operating point.

The decoder's skip concats materialize ~270MB/forward of HBM traffic at
batch 96 (write + re-reads across GN stats, GN apply, conv1, and
nin_shortcut). skip_concat='split' (models/unet_small.py SplitConv +
ops/groupnorm.py cat2 GN) removes the concatenated tensor entirely —
same MACs, fp-reassociation drift only (tests/test_split_concat.py).

Rows (all int8 static + quant_skip_attn + einsum_merged + bf16_onepass
GN, the bench.py measured path; host-fetch window close):
  A. skip_concat='concat' 96x64   — reproduction of the 1968-1970 point
  B. skip_concat='split'  96x64
  C. skip_concat='split'  96x48
  D. split + bf16 (no int8)       — does the win survive without quant?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp


def build(skip_concat, batch, nb, quant="static"):
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler

    kw = dict(quant_int8="static", quant_skip_attn=True) if quant else {}
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                    in_channels=3, resolution=32, dtype=jnp.bfloat16,
                    softmax_f32=False, attn_impl="einsum_merged",
                    skip_concat=skip_concat, **kw)
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    if quant:
        params = sampler.calibrate_quant(params, jax.random.key(3),
                                        n_sample=8, n_rounds=1)

    def prog(k):
        out = sample_many(sampler, params, k, nb, batch)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    return jax.jit(prog)


def run(tag, skip_concat, batch=96, nb=64, quant="static", reps=3):
    gen = build(skip_concat, batch, nb, quant)
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: compiling...", flush=True)
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
    print(f"{tag:44s} {batch*nb*reps/dt:7.1f} img/s", flush=True)
    os.environ.pop("DXMI_GN_STATS", None)


def main():
    want = set(sys.argv[1:])

    def on(tag):
        return not want or any(w in tag for w in want)

    if on("A"):
        run("A concat int8 96x64 (repro)", "concat")
    if on("B"):
        run("B split  int8 96x64", "split")
    if on("C"):
        run("C split  int8 96x48", "split", nb=48)
    if on("D"):
        run("D split  bf16 96x64 (no int8)", "split", quant=None)


if __name__ == "__main__":
    main()
