"""On-chip: LSUN-Bedroom 256^2 EDM sampling — int8 (W8A8 static) vs bf16.

The 526M-param 256^2 model is activation/weight-read bound (~30% MFU,
PERF.md); int8 halves both weight and activation conv traffic, so this
is the one large model where the quant path could pay more than the
ImageNet64 +4.5%.

    python scripts/bench_lsun_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax

from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler

# configs/lsun/T4.yaml diffusion block (reference configs/lsun/T4.yaml)
CFG = dict(sigma_min=0.002, sigma_max=80.0, image_size=256,
           num_channels=256, num_res_blocks=3, num_heads=4,
           num_heads_upsample=-1, num_head_channels=64,
           attention_resolutions="32,16,8", channel_mult="",
           dropout=0.0, class_cond=False, use_checkpoint=False,
           use_scale_shift_norm=True, resblock_updown=True, use_fp16=True)
T = 4


def build(quant):
    net, diffusion = create_model_and_diffusion(**CFG, quant_int8=quant)
    return EDMSampler(net, diffusion, sample_shape=(3, 256, 256),
                      n_timesteps=T, class_cond=False,
                      trainable_beta="fix_last")


def bench(tag, s, params, batch=8, nb=4, reps=2):
    key = jax.random.key(1)
    gen = jax.jit(lambda p, k: sample_many(s, p, k, nb, batch))
    jax.block_until_ready(gen(params, key))
    jax.block_until_ready(gen(params, jax.random.key(2)))
    ks = [jax.random.fold_in(key, 10 + i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out = gen(params, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag:28s} {batch*nb*reps/dt:7.2f} img/s", flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    s_fp = build(False)
    params = s_fp.init_params(jax.random.key(0))
    if mode == "all":
        bench("bf16 b8 (baseline)", s_fp, params)

    s_q = build("static")
    qparams = s_q.calibrate_quant(dict(params), jax.random.key(3),
                                  n_sample=2, n_rounds=1)
    if mode == "all":
        bench("int8 static b8", s_q, qparams)
        bench("int8 static b4", s_q, qparams, batch=4, nb=8)
        bench("int8 static b16", s_q, qparams, batch=16, nb=2)
    else:  # follow-up: batch scaling A/B above the old bf16 flat zone
        bench("bf16 b16", s_fp, params, batch=16, nb=2)
        bench("int8 static b16", s_q, qparams, batch=16, nb=2)
        bench("bf16 b32", s_fp, params, batch=32, nb=1)
        bench("int8 static b32", s_q, qparams, batch=32, nb=1)
        bench("int8 static b24", s_q, qparams, batch=24, nb=2)


if __name__ == "__main__":
    main()
