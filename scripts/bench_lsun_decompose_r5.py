"""Round-5 LSUN-256 decomposition AT the r4 record point (int8 + fused
+ phase + bf16_onepass GN + nomax, b16, 19.47 img/s) — VERDICT r4 task
5: the conv stack is the step's mass (attention ~4%, r1 decomposition)
and has not been decomposed since round 1.

    python scripts/bench_lsun_decompose_r5.py full       # repro
    python scripts/bench_lsun_decompose_r5.py noattn     # attention identity (BOUND)
    python scripts/bench_lsun_decompose_r5.py gn_affine  # GN stats removed (BOUND)
    python scripts/bench_lsun_decompose_r5.py conv1x1    # resblock 3x3 -> 1x1 (FLOP BOUND:
                                                         # ~9x fewer conv MACs, same tensor
                                                         # traffic -> separates FLOP- from
                                                         # bandwidth-bound)
    python scripts/bench_lsun_decompose_r5.py half_depth # num_res_blocks 3 -> 1 (depth bound)

Bounds are wrong-numerics timing probes (the r1/r2 methodology); one
variant per process, serialized-dispatch chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

os.environ.setdefault("DXMI_GN_STATS", "bf16_onepass")
os.environ.setdefault("DXMI_FUSED_NOMAX", "1")

import jax
import jax.numpy as jnp

import dxmi_tpu.models.unet_adm as unet_adm
from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

if VARIANT == "gn_affine":
    import dxmi_tpu.ops.groupnorm as gnm

    def _affine(x, scale, bias, num_groups, eps, silu):
        y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y

    gnm.group_norm_silu_reference = _affine

if VARIANT == "noattn":
    unet_adm.AttentionBlockADM.__call__ = lambda self, x: x

if VARIANT == "conv1x1":
    import flax.linen as nn

    def _conv1(self, name, kernel_init=None):
        if self.quant:
            from dxmi_tpu.ops.quant import QConv

            return QConv(self.out_channels, (1, 1), padding=0,
                         dtype=self.dtype,
                         static_act=(self.quant == "static"),
                         kernel_init=kernel_init, name=name)
        return nn.Conv(self.out_channels, (1, 1), padding=0,
                       dtype=self.dtype,
                       kernel_init=kernel_init or
                       nn.initializers.lecun_normal(), name=name)

    unet_adm.ResBlockADM._conv3 = _conv1

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=256,
           num_channels=256, num_res_blocks=3, num_heads=4,
           num_heads_upsample=-1, num_head_channels=64,
           attention_resolutions="32,16,8", channel_mult="", dropout=0.0,
           class_cond=False, use_checkpoint=False,
           use_scale_shift_norm=True, resblock_updown=True, use_fp16=True,
           attn_impl="fused", quant_int8="static", up_impl="phase",
           quant_attn="static")
if VARIANT == "half_depth":
    CFG["num_res_blocks"] = 1


def main():
    net, diffusion = create_model_and_diffusion(**CFG)
    s = EDMSampler(net, diffusion, sample_shape=(3, 256, 256),
                   n_timesteps=4, class_cond=False, num_classes=0,
                   trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    params = s.calibrate_quant(params, jax.random.key(3), n_sample=2,
                               n_rounds=1)
    B, NB, reps = 16, 4, 2

    def prog(p, k):
        out = sample_many(s, p, k, NB, B)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    print(f"[{time.strftime('%H:%M:%S')}] lsun {VARIANT}: compiling...",
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
    print(f"lsun_{VARIANT:12s} {B*NB*reps/dt:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
