"""On-chip: widen the fused-attention gate to LSUN's 32^2 map
(S=1024, C=512, nh=8) and A/B against flash.

The production gate bounds S*C <= 1024*384 (ImageNet64 ds2 measured);
the LSUN map's working set is ~13 MB (x/h/q/k/v/out ~7 MB bf16 +
4xC^2 weights ~2 MB + fp32 logit tile 1 MB + slack) — inside VMEM on
paper, unmeasured. LSUN's other attention maps (16^2/8^2 at C=1024)
stay gated off by C<=768 either way.

    python scripts/bench_lsun_fused_attn.py
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

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=256,
           num_channels=256, num_res_blocks=3, num_heads=4,
           num_heads_upsample=-1, num_head_channels=64,
           attention_resolutions="32,16,8", channel_mult="",
           dropout=0.0, class_cond=False, use_checkpoint=False,
           use_scale_shift_norm=True, resblock_updown=True, use_fp16=True)

_orig = ab.fused_attn_available


def wide_gate(seq_len, channels, num_heads):
    if channels % num_heads or channels // num_heads > 256:
        return False
    return (seq_len >= 64 and seq_len % 64 == 0 and channels <= 768
            and seq_len * channels <= 1024 * 512)


def run(tag, attn_impl, batch=8, nb=4, reps=2):
    net, diffusion = create_model_and_diffusion(**CFG, attn_impl=attn_impl)
    s = EDMSampler(net, diffusion, sample_shape=(3, 256, 256), n_timesteps=4,
                   class_cond=False, trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    gen = jax.jit(lambda p, k: sample_many(s, p, k, nb, batch))
    key = jax.random.key(1)
    jax.block_until_ready(gen(params, key))
    jax.block_until_ready(gen(params, jax.random.key(2)))
    ks = [jax.random.fold_in(key, 10 + i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(params, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:26s} b{batch}: {batch*nb*reps/dt:7.2f} img/s", flush=True)


run("flash (default)", "flash")
ab.fused_attn_available = wide_gate
unet_adm.fused_attn_available = wide_gate
try:
    run("fused wide-gate", "fused")
    run("fused wide-gate b16", "fused", batch=16, nb=2)
finally:
    ab.fused_attn_available = _orig
    unet_adm.fused_attn_available = _orig
