"""On-chip: do int8 ResBlock convs and the fused attention block compose?
ImageNet64 EDM T=10 sampling, plus an in-model sample-drift probe for the
fused kernel vs the flash path.

    python scripts/bench_fused_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
           num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
           num_head_channels=64, attention_resolutions="32,16,8",
           channel_mult="", dropout=0.0, class_cond=True,
           use_checkpoint=False, use_scale_shift_norm=True,
           resblock_updown=True, use_fp16=True)


def build(attn_impl, quant=False):
    net, diffusion = create_model_and_diffusion(**CFG, attn_impl=attn_impl,
                                                quant_int8=quant)
    return EDMSampler(net, diffusion, sample_shape=(3, 64, 64),
                      n_timesteps=10, class_cond=True, num_classes=1000,
                      trainable_beta="fix_last")


def bench(tag, s, params, batch=8, nb=32):
    gen = jax.jit(lambda p, k: sample_many(s, p, k, nb, batch))
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
    print(f"{tag:28s} {batch*nb*2/dt:7.2f} img/s", flush=True)


def main():
    s_flash = build("flash")
    params = s_flash.init_params(jax.random.key(0))

    # drift probe needs non-zero weights (zero-init output convs)
    leaves, tdef = jax.tree.flatten(params["net"])
    ks = jax.random.split(jax.random.key(77), len(leaves))
    pert = jax.tree.unflatten(
        tdef, [l + 0.05 * jax.random.normal(k_, l.shape, l.dtype)
               for k_, l in zip(ks, leaves)])
    params_d = dict(params)
    params_d["net"] = pert
    s_fused = build("fused")
    k = jax.random.key(9)
    a = jax.jit(lambda p, kk: s_flash.sample(p, kk, 8, i_class=0)["sample"])(
        params_d, k)
    b = jax.jit(lambda p, kk: s_fused.sample(p, kk, 8, i_class=0)["sample"])(
        params_d, k)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    print(f"fused-vs-flash sample drift: "
          f"{np.abs(a-b).mean()/(np.abs(a).mean()+1e-8):.4f}", flush=True)

    s_qf = build("flash", quant="static")
    qparams = s_qf.calibrate_quant(dict(params), jax.random.key(3),
                                   n_sample=8, n_rounds=1, i_class=0)
    bench("int8 + flash", s_qf, qparams)
    s_qu = build("fused", quant="static")
    bench("int8 + fused block", s_qu, qparams)
    bench("int8 + fused block b16", s_qu, qparams, batch=16, nb=16)


def batch_sweep():
    s_qu = build("fused", quant="static")
    s_flash = build("flash")
    params = s_flash.init_params(jax.random.key(0))
    qparams = s_qu.calibrate_quant(dict(params), jax.random.key(3),
                                   n_sample=8, n_rounds=1, i_class=0)
    for b, nb in ((24, 10), (32, 8), (48, 5), (64, 4)):
        bench(f"int8 + fused b{b}", s_qu, qparams, batch=b, nb=nb)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        batch_sweep()
    else:
        main()
