"""Drift sweep over the int8 activation-calibration statistic
(ops/quant.CALIB_QUANTILE): per-channel max (1.0) vs Q-Diffusion-style
percentile clipping. Measures end-to-end T=10 sample drift of the
static-int8 CIFAR net vs its bf16 twin on a common key, at several
quantiles.

Weights are PERTURBED random init (same probe discipline as
scripts/bench_edm_int8.py: raw init can degenerate the probe).

    python scripts/bench_calib_quantile.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import dxmi_tpu.ops.quant as quant
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers.var import VARSampler

KW = dict(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
          attn_resolutions=(16,), dropout=0.0, in_channels=3, resolution=32,
          dtype=jnp.bfloat16, softmax_f32=False)

net_fp = UNetSmall(**KW)
net_q = UNetSmall(**KW, quant_int8="static")
s_fp = VARSampler(net_fp, n_timesteps=10, sample_shape=(3, 32, 32),
                  trainable_beta="fix_last")
s_q = VARSampler(net_q, n_timesteps=10, sample_shape=(3, 32, 32),
                 trainable_beta="fix_last")

params = s_fp.init_params(jax.random.key(0))
leaves, tdef = jax.tree.flatten(params["net"])
ks = jax.random.split(jax.random.key(77), len(leaves))
params = dict(params, net=jax.tree.unflatten(
    tdef, [l + 0.05 * jax.random.normal(k_, l.shape, l.dtype)
           for k_, l in zip(ks, leaves)]))

k = jax.random.key(9)
a = jax.jit(lambda p, kk: s_fp.sample(p, kk, 64)["sample"])(params, k)
a = np.asarray(a, np.float32)
gen_q = jax.jit(lambda p, kk: s_q.sample(p, kk, 64)["sample"])

for q in [1.0, 0.9999, 0.999, 0.995, 0.99]:
    quant.CALIB_QUANTILE = q
    qp = s_q.calibrate_quant(dict(params), jax.random.key(3),
                             n_sample=64, n_rounds=2)
    b = np.asarray(gen_q(qp, k), np.float32)
    drift = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)
    print(f"CALIB_QUANTILE={q:<7} drift={drift:.4f}", flush=True)
