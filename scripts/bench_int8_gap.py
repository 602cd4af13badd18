"""Where is the remaining int8-static gap to 2,000 img/s? (VERDICT r1 #2)

The epilogue ablation (bench_int8_ablate.py) showed quantize/dequant is
free; the residual is the non-conv fraction. This script decomposes THAT:
GN statistics dtype, attention (skip-quant / removed bound), last-level
quant skip — all at the exact bench.py shape (const-baked, 64x64, T=10).

Run on the real chip (one TPU client at a time):
    python scripts/bench_int8_gap.py [tags...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.ops import groupnorm as gn_mod
from dxmi_tpu.models import unet_small as us
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

BATCH, NB = 64, 64


def run(tag, net_kwargs=None, calibrate=True):
    net = us.UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                       num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                       in_channels=3, resolution=32, dtype=jnp.bfloat16,
                       softmax_f32=False, quant_int8="static",
                       **(net_kwargs or {}))
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    if calibrate:
        params = sampler.calibrate_quant(params, jax.random.key(3),
                                         n_sample=8, n_rounds=1)
    gen = jax.jit(lambda k: sample_many(sampler, params, k, NB, BATCH))
    key = jax.random.key(1)
    jax.block_until_ready(gen(key))
    for i in range(4):                      # ramp
        out = gen(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    ks = [jax.random.fold_in(key, 100 + i) for i in range(3)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:28s} {BATCH*NB*len(ks)/dt:7.1f} img/s", flush=True)


def gn_bf16_stats(x, scale, bias, num_groups, eps, silu):
    """GN with statistics in the compute dtype (bf16) — timing candidate."""
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    xf = x.reshape(B, -1, num_groups, C // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, -1, C) * scale.astype(orig_dtype) + bias.astype(orig_dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(x.shape)


def gn_affine_only(x, scale, bias, num_groups, eps, silu):
    """TIMING BOUND (wrong numerics): GN reductions removed."""
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y


class NoAttn(us.AttnBlock):
    """TIMING BOUND (wrong numerics): attention block = identity."""

    def __call__(self, x):
        return x


def main():
    want = set(sys.argv[1:])

    def on(tag):
        return not want or tag in want

    orig_ref = gn_mod.group_norm_silu_reference
    orig_attn = us.AttnBlock

    if on("int8"):
        run("int8 static (baseline)")
    if on("skip_attn"):
        run("int8 + quant_skip_attn", {"quant_skip_attn": True})
    if on("skip_last"):
        run("int8 + quant_skip_last_level", {"quant_skip_last_level": True})
    if on("gn_bf16"):
        gn_mod.group_norm_silu_reference = gn_bf16_stats
        try:
            run("int8 + bf16 GN stats")
        finally:
            gn_mod.group_norm_silu_reference = orig_ref
    if on("gn_bound"):
        gn_mod.group_norm_silu_reference = gn_affine_only
        try:
            run("int8 + GN affine only BOUND")
        finally:
            gn_mod.group_norm_silu_reference = orig_ref
    if on("attn_bound"):
        us.AttnBlock = NoAttn
        try:
            run("int8 + attn removed BOUND")
        finally:
            us.AttnBlock = orig_attn


if __name__ == "__main__":
    main()
