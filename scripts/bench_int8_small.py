"""int8-static const-baked sweep at small batches."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax
import jax.numpy as jnp
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.var import VARSampler

net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                attn_resolutions=(16,), dropout=0.0, in_channels=3,
                resolution=32, dtype=jnp.bfloat16, softmax_f32=False,
                quant_int8="static")
s = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
               trainable_beta="fix_last")
params = s.init_params(jax.random.key(0))
params = s.calibrate_quant(params, jax.random.key(2), n_sample=64, n_rounds=2)
key = jax.random.key(1)

for batch, nb in [(64, 8), (64, 64), (128, 32), (96, 48), (48, 96)]:
    gen = jax.jit(lambda k, b=batch, n=nb: sample_many(s, params, k, n, b))
    jax.block_until_ready(gen(key))
    reps = max(1, 3 * 4096 // (batch * nb))
    t0 = time.perf_counter()
    for i in range(reps):
        out = gen(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"int8 batch={batch:4d} nb={nb:3d} {batch*nb*reps/dt:8.1f} img/s",
          flush=True)
