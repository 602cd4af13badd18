import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (repo path + persistent compile cache)

import jax
import jax.numpy as jnp
from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers.edm import EDMSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

B, T = 16, 10
net, diffusion = create_model_and_diffusion(
    sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
    num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
    num_head_channels=64, attention_resolutions="32,16,8", channel_mult="",
    dropout=0.0, class_cond=True, use_checkpoint=False,
    use_scale_shift_norm=True, resblock_updown=True, use_fp16=True)
sampler = EDMSampler(net, diffusion, sample_shape=(3, 64, 64), n_timesteps=T,
                     class_cond=True, num_classes=1000,
                     trainable_beta="fix_last")
value = TimeIndependentValue(net=IGEBMEncoder(nh=128, keepdim=False,
                                              learn_out_scale=True,
                                              in_chan=3))
trainer = DxMITrainerCond(batchsize=B, tau1=0.01, tau2=0.1, gamma=0.01,
                          n_timesteps=T, q_beta_schedule="constant",
                          q_beta_start=1.0, q_beta_end=1.0)
trainer.set_models(sampler, value, lr=1e-8, v_lr=1e-5, beta_lr=1e-5, donate=True)
sp = sampler.init_params(jax.random.key(0))
vp = value.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1,), jnp.int32))["params"]
state = trainer.init_state(sp, vp)
img = jax.random.normal(jax.random.key(2), (B, 64, 64, 3))
y = jnp.zeros((B,), jnp.int32)
key = jax.random.key(3)
sample_fn = jax.jit(lambda p, k: sampler.sample(p, k, B))

def step(state, k):
    k1, k2, k3 = jax.random.split(k, 3)
    d = sample_fn(state.sampler_params, k1)
    traj = buflib.from_d_sample(d)
    state, m1 = trainer.update_f_v(state, img, traj, k2, y=y)
    state, m2 = trainer.update_sampler(state, traj, k3)
    return state, m2

# true host-fetch sync each step: on the axon backend
# jax.block_until_ready does NOT reliably block (CLAUDE.md); a float()
# fetch does.  Round-5 fix — the block_until_ready version reported a
# bogus 99.3 ms/step for the fused_train variant (PERF.md r5).
for i in range(3):
    state, m = step(state, jax.random.fold_in(key, i))
    float(m["sampler/sampler_loss_"])
N = 5
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, 100 + i))
    float(m["sampler/sampler_loss_"])
dt = time.perf_counter() - t0
print(f"imagenet64 cond train step: {dt/N*1000:7.1f} ms/step "
      f"({B*N/dt:5.1f} img/s trained)", flush=True)
