"""On-chip timing of the full in-training FID pipeline (10k samples ->
Inception activations -> stats), random-init weights (timing only)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.fid import runner as fid_runner
from dxmi_tpu.fid import stats as stats_lib
from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers.var import VARSampler

net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                attn_resolutions=(16,), dropout=0.0, in_channels=3,
                resolution=32, dtype=jnp.bfloat16, softmax_f32=False)
sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                     trainable_beta="fix_last")
params = sampler.init_params(jax.random.key(0))

inc = InceptionV3FID()
inc_params = random_fid_inception_params(jax.random.key(1))

def extract_raw(x01):
    return inc.apply({"params": inc_params}, x01)

m2 = np.zeros(2048); s2 = np.eye(2048)
fs = fid_runner.FIDState(jax.jit(extract_raw), m2, s2, extract_raw=extract_raw)

# warm
t0 = time.perf_counter()
fid = fid_runner.compute_fid_from_sampler(
    sampler, params, jax.random.key(2), fs, n_samples=1024, batch=64,
    dispatch_chunk=16)
print(f"warm 1k: {time.perf_counter()-t0:.1f}s (fid={fid:.1f})", flush=True)

for tag in ["10k cold-cache", "10k steady"]:
    t0 = time.perf_counter()
    fid = fid_runner.compute_fid_from_sampler(
        sampler, params, jax.random.key(3), fs, n_samples=10000, batch=64,
        dispatch_chunk=16)
    dt = time.perf_counter() - t0
    print(f"{tag} FID pipeline: {dt:.1f}s ({10000/dt:.0f} img/s end-to-end)",
          flush=True)
