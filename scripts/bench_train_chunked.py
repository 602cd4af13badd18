"""On-chip A/B: fused DxMI train step with sample_chunks=1 vs 2
(full-size CIFAR-10 T=10 config, global batch 128).

The sampling phase is ~210 of the 268 ms step; the params-as-args
sampling A/B (bench_train_sample_chunk.py) says 2x64 is +9% over 1x128
on that phase. Timing ends on a host FETCH (block_until_ready does not
truly block on this backend).

    timeout 3000 python scripts/bench_train_chunked.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers.dxmi import DxMITrainer

B, T = 128, 10


def run(chunks, reps=10):
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                    attn_resolutions=(16,), dropout=0.1, in_channels=3,
                    resolution=32)
    sampler = VARSampler(net, n_timesteps=T, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=128, keepdim=False,
                                                  learn_out_scale=True))
    trainer = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                          n_timesteps=T, use_sampler_beta=True,
                          adavelreg=0.99, sample_chunks=chunks)
    trainer.set_models(sampler, value, lr=1e-7, v_lr=1e-5, beta_lr=1e-5)
    sp = sampler.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = trainer.init_state(sp, vp)
    img = jax.random.normal(jax.random.key(2), (B, 32, 32, 3))
    key = jax.random.key(3)

    for i in range(5):
        state, m = trainer.train_step(state, img, jax.random.fold_in(key, i))
    float(jax.device_get(m["sampler/sampler_loss_"]))
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = trainer.train_step(state, img,
                                      jax.random.fold_in(key, 100 + i))
    float(jax.device_get(m["sampler/sampler_loss_"]))
    dt = time.perf_counter() - t0
    print(f"sample_chunks={chunks}: {dt/reps*1000:7.1f} ms/step "
          f"({B*reps/dt:6.1f} img/s trained)", flush=True)


run(1)
run(2)
run(1)
run(4)
