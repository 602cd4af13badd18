"""60-step full-size ImageNet64 cond-training stability run with the
flash-attention default (validates the Pallas kernel's backward at scale:
finite losses, finite params, moving sampler loss)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.models.unet_adm import create_model_and_diffusion
from dxmi_tpu.samplers.edm import EDMSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

B, T, STEPS = 16, 10, 60
net, diffusion = create_model_and_diffusion(
    sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=192,
    num_res_blocks=3, num_heads=4, num_heads_upsample=-1,
    num_head_channels=64, attention_resolutions="32,16,8", channel_mult="",
    dropout=0.0, class_cond=True, use_checkpoint=False,
    use_scale_shift_norm=True, resblock_updown=True, use_fp16=True)
# default run validates the flash backward; DXMI_FUSED_ATTN=train runs
# the same 60 steps through the fused pallas backward (r5 task 2)
assert net.attn_impl in ("flash", "fused_train"), net.attn_impl
print(f"attn_impl = {net.attn_impl}", flush=True)
sampler = EDMSampler(net, diffusion, sample_shape=(3, 64, 64), n_timesteps=T,
                     class_cond=True, num_classes=1000,
                     trainable_beta="fix_last")
value = TimeIndependentValue(net=IGEBMEncoder(nh=128, keepdim=False,
                                              learn_out_scale=True,
                                              in_chan=3))
trainer = DxMITrainerCond(batchsize=B, tau1=0.01, tau2=0.1, gamma=0.01,
                          n_timesteps=T, q_beta_schedule="constant",
                          q_beta_start=1.0, q_beta_end=1.0)
trainer.set_models(sampler, value, lr=1e-5, v_lr=1e-5, beta_lr=1e-5,
                   donate=True)
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
    return state, {**m1, **m2}


losses = []
t0 = time.perf_counter()
for i in range(STEPS):
    state, m = step(state, jax.random.fold_in(key, i))
    if i % 10 == 0 or i == STEPS - 1:
        sl = float(m["sampler/sampler_loss_"])
        dl = float(m["ebm/d_loss_"])
        losses.append((i, dl, sl))
        print(f"step {i:3d}: d_loss={dl:+.4f} sampler_loss={sl:+.4f}",
              flush=True)
        assert np.isfinite(dl) and np.isfinite(sl), (i, dl, sl)
dt = time.perf_counter() - t0
finite = all(np.isfinite(np.asarray(a)).all()
             for a in jax.tree.leaves(state.sampler_params))
print(f"{STEPS} steps in {dt:.0f}s ({dt/STEPS*1000:.0f} ms/step incl. "
      f"logging syncs); params finite: {finite}", flush=True)
assert finite
sl0, sln = losses[0][2], losses[-1][2]
print(f"sampler loss moved {sl0:+.4f} -> {sln:+.4f}", flush=True)
