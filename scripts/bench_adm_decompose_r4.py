"""Round-4 ImageNet64 decomposition AT the current best operating point
(int8 + fused attention with in-kernel W8A8 + phase upsample, b32,
81.2 img/s) — what bounds the next lever?

    python scripts/bench_adm_decompose_r4.py full        # repro
    python scripts/bench_adm_decompose_r4.py noattn      # attention = identity (BOUND)
    python scripts/bench_adm_decompose_r4.py gn_affine   # GN stats removed (BOUND)

Bounds are wrong-numerics timing probes (the r1/r2 decomposition
methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

import jax
import jax.numpy as jnp

import dxmi_tpu.models.unet_adm as unet_adm
from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

if VARIANT == "gn_affine":
    # resblock GN statistics removed (BOUND; the fused attention blocks'
    # in-kernel GN is untouched)
    import dxmi_tpu.ops.groupnorm as gnm

    def _affine(x, scale, bias, num_groups, eps, silu):
        y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y

    gnm.group_norm_silu_reference = _affine

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
           num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
           num_head_channels=64, attention_resolutions="32,16,8",
           channel_mult="", dropout=0.0, class_cond=True,
           use_checkpoint=False, use_scale_shift_norm=True,
           resblock_updown=True, use_fp16=True, attn_impl="fused",
           quant_int8="static", up_impl="phase", quant_attn="static")

if VARIANT == "noattn":
    unet_adm.AttentionBlockADM.__call__ = lambda self, x: x


def main():
    net, diffusion = create_model_and_diffusion(**CFG)
    s = EDMSampler(net, diffusion, sample_shape=(3, 64, 64), n_timesteps=10,
                   class_cond=True, num_classes=1000,
                   trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    params = s.calibrate_quant(params, jax.random.key(3), n_sample=4,
                               n_rounds=1)
    B, NB, reps = 32, 8, 2

    def prog(p, k):
        out = sample_many(s, p, k, NB, B)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    print(f"[{time.strftime('%H:%M:%S')}] {VARIANT}: compiling...",
          flush=True)
    out, scal = gen(params, jax.random.key(1))
    float(scal)
    for i in range(2):
        out, scal = gen(params, jax.random.fold_in(jax.random.key(1), i))
    float(scal)
    ks = [jax.random.fold_in(jax.random.key(2), i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out, scal = gen(params, k)
    float(scal)
    dt = time.perf_counter() - t0
    print(f"{VARIANT:12s} {B*NB*reps/dt:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
