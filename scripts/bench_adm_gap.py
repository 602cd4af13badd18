"""ImageNet64 (ADM net) residual-gap decomposition at the 75.5 img/s
operating point (int8 static convs + fused attention, batch 32) —
VERDICT r2 weak #5 asks where the ~27-30% MFU ceiling comes from before
attempting more fusion.

Bounds are WRONG NUMERICS, timing only (same discipline as
scripts/bench_gap2.py for the CIFAR net):
  base     — reproduction of the int8+fused b32 row (PERF.md: 75.5)
  attn_id  — every attention block replaced by identity
  gn_aff   — GroupNorm statistics removed (affine+SiLU only)
  no_silu  — SiLU removed everywhere GN fuses it

    python scripts/bench_adm_gap.py [tags...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.models import unet_adm as adm
from dxmi_tpu.ops import groupnorm as gn_mod
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
           num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
           num_head_channels=64, attention_resolutions="32,16,8",
           channel_mult="", dropout=0.0, class_cond=True,
           use_checkpoint=False, use_scale_shift_norm=True,
           resblock_updown=True, use_fp16=True)

BATCH, NB = 32, 8

_orig_gn = gn_mod.fused_group_norm


def gn_affine_only(x, scale, bias, num_groups, eps, silu):
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y


def gn_no_silu(x, scale, bias, num_groups, eps, silu):
    return _orig_gn(x, scale, bias, num_groups, eps, False)


def run(tag):
    net, diffusion = adm.create_model_and_diffusion(
        **CFG, attn_impl="fused", quant_int8="static")
    s = EDMSampler(net, diffusion, sample_shape=(3, 64, 64), n_timesteps=10,
                   class_cond=True, num_classes=1000, trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    params = s.calibrate_quant(params, jax.random.key(3), n_sample=4,
                               n_rounds=1)
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: compiling...", flush=True)

    def prog(p, k):
        out = sample_many(s, p, k, NB, BATCH)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    key = jax.random.key(1)
    out, scal = gen(params, key)
    float(scal)
    for i in range(2):
        out, scal = gen(params, jax.random.fold_in(key, i))
    float(scal)
    ks = [jax.random.fold_in(key, 100 + i) for i in range(2)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out, scal = gen(params, k)
    float(scal)
    dt = time.perf_counter() - t0
    print(f"{tag:40s} {BATCH*NB*len(ks)/dt:7.2f} img/s", flush=True)


def main():
    want = set(sys.argv[1:])

    def on(t):
        return not want or any(w in t for w in want)

    if on("base"):
        run("base int8+fused b32 (repro 75.5)")
    if on("attn_id"):
        adm.fused_attn_block = lambda x, *a, **kw: x
        adm.flash_mha = lambda q, k, v, **kw: v
        orig_av = adm.fused_attn_available
        adm.fused_attn_available = lambda *a: True
        run("attn_id BOUND (attention identity)")
        adm.fused_attn_block = fused_attn_block_orig
        adm.flash_mha = flash_mha_orig
        adm.fused_attn_available = orig_av
    if on("gn_aff"):
        gn_mod.fused_group_norm = gn_affine_only
        run("gn_aff BOUND (GN stats removed)")
        gn_mod.fused_group_norm = _orig_gn
    if on("no_silu"):
        gn_mod.fused_group_norm = gn_no_silu
        run("no_silu BOUND (GN-fused SiLU removed)")
        gn_mod.fused_group_norm = _orig_gn


fused_attn_block_orig = adm.fused_attn_block
flash_mha_orig = adm.flash_mha

if __name__ == "__main__":
    main()
