"""GN-stats formulation x int8 matrix at the bench.py shape.

Follow-up to bench_int8_gap.py: GN statistics are the dominant non-conv
cost (affine-only bound 2050 vs 1604 int8 baseline). Measures the
DXMI_GN_STATS variants combined with quant_skip_attn, plus the fused
attention block under int8, plus the 96x48 dispatch shape.

Run on the real chip: python scripts/bench_gn_stats.py [tags...]
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


def run(tag, net_kwargs=None, gn_stats="fp32", batch=64, nb=64):
    os.environ["DXMI_GN_STATS"] = gn_stats
    try:
        net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                        num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                        in_channels=3, resolution=32, dtype=jnp.bfloat16,
                        softmax_f32=False, quant_int8="static",
                        **(net_kwargs or {}))
        sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                             trainable_beta="fix_last")
        params = sampler.init_params(jax.random.key(0))
        params = sampler.calibrate_quant(params, jax.random.key(3),
                                         n_sample=8, n_rounds=1)
        gen = jax.jit(lambda k: sample_many(sampler, params, k, nb, batch))
        key = jax.random.key(1)
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
        print(f"{tag:44s} {batch*nb*len(ks)/dt:7.1f} img/s", flush=True)
    finally:
        os.environ.pop("DXMI_GN_STATS", None)


def main():
    want = set(sys.argv[1:])

    def on(tag):
        return not want or tag in want

    skip = {"quant_skip_attn": True}
    if on("onepass"):
        run("int8 + skip_attn + onepass fp32 GN", skip, "onepass")
    if on("bf16"):
        run("int8 + skip_attn + bf16 GN", skip, "bf16")
    if on("bf16_onepass"):
        run("int8 + skip_attn + bf16_onepass GN", skip, "bf16_onepass")
    if on("base"):
        run("int8 + skip_attn + fp32 GN (ref)", skip, "fp32")
    if on("fused_attn"):
        run("int8 + fused-attn + bf16_onepass GN",
            {"attn_impl": "fused", "quant_skip_attn": True}, "bf16_onepass")
    if on("shape"):
        run("int8 + skip_attn + bf16_onepass GN 96x48", skip,
            "bf16_onepass", batch=96, nb=48)
        run("int8 + skip_attn + bf16_onepass GN 48x96", skip,
            "bf16_onepass", batch=48, nb=96)
        run("int8 + skip_attn + bf16_onepass GN 32x128", skip,
            "bf16_onepass", batch=32, nb=128)


def extra():
    """Round-2 follow-up: int8 moves the batch optimum up (as on ADM/LSUN);
    sweep past 96 + try the Pallas GN kernel in the int8 context."""
    skip = {"quant_skip_attn": True}
    for b, nb in ((80, 48), (112, 36), (128, 32), (96, 64)):
        run(f"int8 skip_attn bf16_onepass {b}x{nb}", skip, "bf16_onepass",
            batch=b, nb=nb)
    os.environ["DXMI_FUSED_GN"] = "1"
    try:
        run("int8 skip_attn PALLAS GN 96x48", skip, "fp32",
            batch=96, nb=48)
    finally:
        os.environ.pop("DXMI_FUSED_GN", None)


def sub():
    """Round-2: spatially-subsampled GN stats (stats read every 2nd/4th
    row; affine-only bound at 96x48 is 2078, so stats cost ~151 img/s)."""
    skip = {"quant_skip_attn": True}
    for mode in ("bf16_onepass_sub2", "bf16_onepass_sub4"):
        for b, nb in ((96, 48),):
            run(f"int8 skip_attn {mode} {b}x{nb}", skip, mode,
                batch=b, nb=nb)


def merged():
    """einsum_merged attention (one (C,3C) qkv matmul, exact numerics) x
    sub-sampled GN stats — the two residual-gap levers combined."""
    skip = {"quant_skip_attn": True, "attn_impl": "einsum_merged"}
    run("int8 skip_attn MERGED bf16_onepass 96x48", skip, "bf16_onepass",
        batch=96, nb=48)
    run("int8 skip_attn MERGED sub2 96x48", skip, "bf16_onepass_sub2",
        batch=96, nb=48)
    run("int8 skip_attn MERGED sub4 96x48", skip, "bf16_onepass_sub4",
        batch=96, nb=48)


def unroll():
    """Scan-unroll codegen sweep at the merged-attention operating point
    (exact semantics; unroll only changes XLA codegen)."""
    skip = {"quant_skip_attn": True, "attn_impl": "einsum_merged"}
    for inner, outer in ((2, 1), (10, 1), (1, 2), (2, 2)):
        os.environ["DXMI_SCAN_UNROLL"] = str(inner)
        os.environ["DXMI_OUTER_UNROLL"] = str(outer)
        try:
            run(f"MERGED unroll inner={inner} outer={outer}", skip,
                "bf16_onepass", batch=96, nb=48)
        finally:
            os.environ.pop("DXMI_SCAN_UNROLL", None)
            os.environ.pop("DXMI_OUTER_UNROLL", None)


if __name__ == "__main__":
    if sys.argv[1:] == ["extra"]:
        extra()
    elif sys.argv[1:] == ["sub"]:
        sub()
    elif sys.argv[1:] == ["merged"]:
        merged()
    elif sys.argv[1:] == ["unroll"]:
        unroll()
    else:
        main()
