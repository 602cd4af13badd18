"""Selective-precision int8 A/B: drift + throughput when the attention
convs (quant_skip_attn) and/or the full-res final decoder level
(quant_skip_last_level) stay bf16 while the rest of the CIFAR U-Net runs
static int8.

Same probe discipline as scripts/bench_calib_quantile.py (perturbed init,
common sampling key, T=10 trajectory drift vs the bf16 twin) and the
PERF.md timing methodology (const-baked params, ramp discard, serialized
multi-batch scan dispatches).

    python scripts/bench_int8_skip.py          # real TPU
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

KW = dict(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
          attn_resolutions=(16,), dropout=0.0, in_channels=3, resolution=32,
          dtype=jnp.bfloat16, softmax_f32=False)
BATCH, NBATCH, REPS = 64, 64, 3

s_fp = VARSampler(UNetSmall(**KW), n_timesteps=10, sample_shape=(3, 32, 32),
                  trainable_beta="fix_last")
params = s_fp.init_params(jax.random.key(0))
leaves, tdef = jax.tree.flatten(params["net"])
ks = jax.random.split(jax.random.key(77), len(leaves))
params = dict(params, net=jax.tree.unflatten(
    tdef, [l + 0.05 * jax.random.normal(k_, l.shape, l.dtype)
           for k_, l in zip(ks, leaves)]))

k_drift = jax.random.key(9)
ref = np.asarray(jax.jit(lambda p, kk: s_fp.sample(p, kk, 64)["sample"])(
    params, k_drift), np.float32)


def run(tag, **skips):
    net = UNetSmall(**KW, quant_int8="static", **skips)
    s = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                   trainable_beta="fix_last")
    qp = s.calibrate_quant(dict(params), jax.random.key(3),
                           n_sample=64, n_rounds=2)
    b = np.asarray(jax.jit(lambda p, kk: s.sample(p, kk, 64)["sample"])(
        qp, k_drift), np.float32)
    drift = np.abs(ref - b).mean() / (np.abs(ref).mean() + 1e-8)

    gen = jax.jit(lambda kk: sample_many(s, qp, kk, NBATCH, BATCH))
    jax.block_until_ready(gen(jax.random.key(1)))
    for i in range(4):
        out = gen(jax.random.key(2 + i))
    jax.block_until_ready(out)
    rep_keys = [jax.random.fold_in(jax.random.key(5), i) for i in range(REPS)]
    jax.block_until_ready(rep_keys)
    t0 = time.perf_counter()
    for kk in rep_keys:
        out = gen(kk)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = BATCH * NBATCH * REPS / dt
    print(f"{tag:<28} drift={drift:.4f}  {ips:7.1f} img/s", flush=True)


run("int8 static (baseline)")
run("+ skip_attn", quant_skip_attn=True)
run("+ skip_last_level", quant_skip_last_level=True)
run("+ skip both", quant_skip_attn=True, quant_skip_last_level=True)
