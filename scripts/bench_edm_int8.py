"""On-chip: int8 (W8A8 static) EDM ImageNet64 sampling vs bf16.

    python scripts/bench_edm_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax

import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=64,
           num_channels=192, num_res_blocks=3, num_heads=4,
           num_heads_upsample=-1, num_head_channels=64,
           attention_resolutions="32,16,8", channel_mult="",
           dropout=0.0, class_cond=True, use_checkpoint=False,
           use_scale_shift_norm=True, resblock_updown=True, use_fp16=True)


def build(quant):
    net, diffusion = create_model_and_diffusion(**CFG, quant_int8=quant)
    return EDMSampler(net, diffusion, sample_shape=(3, 64, 64),
                      n_timesteps=10, class_cond=True, num_classes=1000,
                      trainable_beta="fix_last")


def bench(tag, s, params, batch=8, nb=16):
    key = jax.random.key(1)
    gen = jax.jit(lambda p, k: sample_many(s, p, k, nb, batch))
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
    return out


def main():
    s_fp = build(False)
    params = s_fp.init_params(jax.random.key(0))
    bench("bf16 b8", s_fp, params)

    s_q = build("static")
    qparams = s_q.calibrate_quant(dict(params), jax.random.key(3),
                                  n_sample=8, n_rounds=1, i_class=0)
    bench("int8 static b8", s_q, qparams)
    bench("int8 static b16", s_q, qparams, batch=16, nb=8)

    # drift on a common batch (same keys, fixed class). NOTE: at raw init
    # the zero-initialised output convs make the net output EXACTLY zero,
    # so fp and int8 trajectories coincide and drift reads 0.0000 —
    # perturb the net weights so the probe actually exercises the convs.
    leaves, tdef = jax.tree.flatten(params["net"])
    ks = jax.random.split(jax.random.key(77), len(leaves))
    pert = jax.tree.unflatten(
        tdef, [l + 0.05 * jax.random.normal(k_, l.shape, l.dtype)
               for k_, l in zip(ks, leaves)])
    params_d = dict(params); params_d["net"] = pert
    qparams_d = s_q.calibrate_quant(dict(params_d), jax.random.key(3),
                                    n_sample=8, n_rounds=1, i_class=0)
    k = jax.random.key(9)
    a = jax.jit(lambda p, kk: s_fp.sample(p, kk, 8, i_class=0)["sample"])(params_d, k)
    b = jax.jit(lambda p, kk: s_q.sample(p, kk, 8, i_class=0)["sample"])(qparams_d, k)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    print(f"sample drift vs bf16: {np.abs(a-b).mean()/(np.abs(a).mean()+1e-8):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
