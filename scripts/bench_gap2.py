"""Decompose the residual 1927 -> 2000 gap at the CURRENT operating point
(int8 static + quant_skip_attn + DXMI_GN_STATS=bf16_onepass, 96x48).

Round-2 follow-up to bench_int8_gap.py (which decomposed at the fp32-GN
64x64 point). Bounds monkeypatch group_norm_silu_reference — WRONG
numerics, timing information only. RNG was already ruled out
(bench_rng.py: no-noise bound +0.45%).

Run on chip: python scripts/bench_gap2.py
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

BATCH, NB = 96, 48


def run(tag, net_kwargs=None):
    net = us.UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                       num_res_blocks=2, attn_resolutions=(16,), dropout=0.0,
                       in_channels=3, resolution=32, dtype=jnp.bfloat16,
                       softmax_f32=False, quant_int8="static",
                       quant_skip_attn=True, **(net_kwargs or {}))
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    params = sampler.calibrate_quant(params, jax.random.key(3),
                                     n_sample=8, n_rounds=1)
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: calibrated, compiling...",
          flush=True)
    gen = jax.jit(lambda k: sample_many(sampler, params, k, NB, BATCH))
    key = jax.random.key(1)
    jax.block_until_ready(gen(key))
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: compiled", flush=True)
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
    print(f"{tag:46s} {BATCH*NB*len(ks)/dt:7.1f} img/s", flush=True)


def gn_affine_only(x, scale, bias, num_groups, eps, silu):
    """TIMING BOUND (wrong numerics): GN reductions removed."""
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y


def gn_no_silu(x, scale, bias, num_groups, eps, silu):
    """TIMING BOUND (wrong numerics): SiLU removed, stats kept."""
    return _orig(x, scale, bias, num_groups, eps, False)


_orig = None


def main():
    global _orig
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    _orig = gn_mod.group_norm_silu_reference

    run("baseline (reproduce 1927)")

    gn_mod.group_norm_silu_reference = gn_affine_only
    try:
        run("GN affine-only BOUND")
    finally:
        gn_mod.group_norm_silu_reference = _orig

    gn_mod.group_norm_silu_reference = gn_no_silu
    try:
        run("no-SiLU BOUND")
    finally:
        gn_mod.group_norm_silu_reference = _orig

    class NoAttn(us.AttnBlock):
        """TIMING BOUND (wrong numerics): attention block = identity."""

        def __call__(self, x):
            return x

    orig_attn = us.AttnBlock
    us.AttnBlock = NoAttn
    try:
        run("attn-identity BOUND")
    finally:
        us.AttnBlock = orig_attn


if __name__ == "__main__":
    main()
