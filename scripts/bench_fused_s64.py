"""On-chip: does extending the fused attention block to the S=64 (ds8)
maps pay?  ImageNet64 has 8 such blocks (7 level + 1 middle) at C=768;
the default gate excludes them (S>=256).

    python scripts/bench_fused_s64.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax

import dxmi_tpu.ops.attn_block as ab
import dxmi_tpu.models.unet_adm as unet_adm
from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
           num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
           num_head_channels=64, attention_resolutions="32,16,8",
           channel_mult="", dropout=0.0, class_cond=True,
           use_checkpoint=False, use_scale_shift_norm=True,
           resblock_updown=True, use_fp16=True)

_orig_gate = ab.fused_attn_available


def wide_gate(seq_len, channels, num_heads):
    if channels % num_heads or channels // num_heads > 128:
        return False
    return (seq_len >= 64 and seq_len % 64 == 0 and channels <= 768
            and seq_len * channels <= 1024 * 384)


def run(tag, batch=8, images=256):
    net, diffusion = create_model_and_diffusion(**CFG, attn_impl="fused")
    sampler = EDMSampler(net, diffusion, sample_shape=(3, 64, 64),
                         n_timesteps=10, class_cond=True, num_classes=1000,
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    nb = images // batch
    gen = jax.jit(lambda p, k: sample_many(sampler, p, k, nb, batch))
    key = jax.random.key(1)
    jax.block_until_ready(gen(params, key))
    jax.block_until_ready(gen(params, jax.random.key(2)))
    ks = [jax.random.fold_in(key, 10 + i) for i in range(2)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(params, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:28s} b{batch}: {batch*nb*2/dt:7.2f} img/s", flush=True)


run("fused S>=256 (default)")
ab.fused_attn_available = wide_gate
unet_adm.fused_attn_available = wide_gate
try:
    run("fused S>=64 (wide gate)")
finally:
    ab.fused_attn_available = _orig_gate
    unet_adm.fused_attn_available = _orig_gate
