"""On-chip A/B: fused single-dispatch DxMI train step vs the 3-dispatch
phased path, full-size CIFAR-10 T=10 config (global batch 128).

Usage: timeout 3000 python scripts/bench_train_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax

import jax.numpy as jnp

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi import DxMITrainer

B, T = 128, 10

net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                attn_resolutions=(16,), dropout=0.1, in_channels=3,
                resolution=32)
sampler = VARSampler(net, n_timesteps=T, sample_shape=(3, 32, 32),
                     trainable_beta="fix_last")
value = TimeIndependentValue(net=IGEBMEncoder(nh=128, keepdim=False,
                                              learn_out_scale=True))
trainer = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                      n_timesteps=T, use_sampler_beta=True, adavelreg=0.99)
trainer.set_models(sampler, value, lr=1e-7, v_lr=1e-5, beta_lr=1e-5)

sp = sampler.init_params(jax.random.key(0))
vp = value.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1,), jnp.int32))["params"]
state = trainer.init_state(sp, vp)
img = jax.random.normal(jax.random.key(2), (B, 32, 32, 3))
key = jax.random.key(3)

sample_fn = jax.jit(lambda p, k: sampler.sample(p, k, B))


def phased(state, k):
    k1, k2, k3 = jax.random.split(k, 3)
    d = sample_fn(state.sampler_params, k1)
    traj = buflib.from_d_sample(d)
    state, m1 = trainer.update_f_v(state, img, traj, k2)
    state, m2 = trainer.update_sampler(state, traj, k3, n_generator=1)
    return state, m2


def fused(state, k):
    return trainer.train_step(state, img, k, n_generator=1)


for tag, fn in [("phased (3 dispatches)", phased),
                ("fused (1 dispatch)", fused)]:
    st = state
    # warm: compile + ramp
    for i in range(6):
        st, m = fn(st, jax.random.fold_in(key, i))
    jax.block_until_ready(m["sampler/sampler_loss_"])
    N = 10
    t0 = time.perf_counter()
    for i in range(N):
        st, m = fn(st, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(m["sampler/sampler_loss_"])
    dt = time.perf_counter() - t0
    print(f"{tag:24s} {dt/N*1000:8.1f} ms/step  "
          f"({B*N/dt:6.1f} img/s trained)", flush=True)
