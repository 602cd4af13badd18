"""Where do the int8-static CIFAR sampling cycles go? Ablations over the
dequant epilogue / quantize pass at the exact bench.py shape
(const-baked params, batch 64x64, T=10)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.ops import quant as quant_mod
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

BATCH, NB = 64, 64

_orig = quant_mod.int8_conv_static


def run(tag):
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                    attn_resolutions=(16,), dropout=0.0, in_channels=3,
                    resolution=32, dtype=jnp.bfloat16, softmax_f32=False,
                    quant_int8="static")
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    params = sampler.calibrate_quant(params, jax.random.key(3), n_sample=8,
                                     n_rounds=1)
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
    print(f"{tag:24s} {BATCH*NB*len(ks)/dt:7.1f} img/s", flush=True)


def bf16_dequant(x, kernel, bias, act_scale, strides=(1, 1),
                 padding=((1, 1), (1, 1)), out_dtype=jnp.bfloat16):
    act_scale = jnp.asarray(act_scale, jnp.float32)
    if act_scale.ndim == 1:
        kernel = kernel * act_scale.reshape(1, 1, -1, 1)
        inv = 1.0 / act_scale
        x_q = x.astype(jnp.float32) * inv
        out_scale = 1.0
    else:
        x_q = x.astype(jnp.float32) / act_scale
        out_scale = act_scale
    k_i8, wscale = quant_mod.quantize_per_channel(kernel, axis=-1)
    x_i8 = jnp.clip(jnp.round(x_q), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    sc = (out_scale * wscale.reshape(1, 1, 1, -1)).astype(jnp.bfloat16)
    out = acc.astype(jnp.bfloat16) * sc
    if bias is not None:
        out = out + bias.astype(jnp.bfloat16)
    return out.astype(out_dtype)


def no_round(x, kernel, bias, act_scale, strides=(1, 1),
             padding=((1, 1), (1, 1)), out_dtype=jnp.bfloat16):
    # TIMING ONLY (wrong numerics): drop round+clip to bound their cost
    act_scale = jnp.asarray(act_scale, jnp.float32)
    if act_scale.ndim == 1:
        kernel = kernel * act_scale.reshape(1, 1, -1, 1)
        x_q = x.astype(jnp.float32) * (1.0 / act_scale)
        out_scale = 1.0
    else:
        x_q = x.astype(jnp.float32) / act_scale
        out_scale = act_scale
    k_i8, wscale = quant_mod.quantize_per_channel(kernel, axis=-1)
    x_i8 = x_q.astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (out_scale * wscale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


run("int8 static (baseline)")
quant_mod.int8_conv_static = bf16_dequant
run("bf16 dequant epilogue")
quant_mod.int8_conv_static = no_round
run("no round/clip (bound)")
quant_mod.int8_conv_static = _orig
