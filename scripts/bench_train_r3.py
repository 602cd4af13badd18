"""Round-3 train-step lever probe (VERDICT r2 next-round #8): the fused
DxMI train step (PERF.md: 268 ms / 477 img/s trained) re-measured with
the round-3 sampler-net levers applied to the TRAINING net —
bf16_onepass GN stats + phase upsample (+ nomax softmax). These change
training numerics within the bf16/reassociation class (every lever is
exact-math or precision-class; gradients flow through all of them —
tests/test_upsample_phase.py, tests/test_adm_phase_up.py), so they are
opt-in for training like bf16 itself is.

One variant per process:
  python scripts/bench_train_r3.py base       # parity defaults (repro 268ms)
  python scripts/bench_train_r3.py levers     # bf16 torso + GN/phase/nomax
  python scripts/bench_train_r3.py levers_c2  # + sample_chunks=2
  python scripts/bench_train_r3.py levers_c4  # + sample_chunks=4
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"
if VARIANT.startswith("levers"):
    os.environ["DXMI_GN_STATS"] = "bf16_onepass"

import jax
import jax.numpy as jnp

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.unet_small import UNetSmall
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers.dxmi import DxMITrainer

B, T = 128, 10


def main():
    kw = {}
    if VARIANT.startswith("levers"):
        kw = dict(dtype=jnp.bfloat16, softmax_f32=False,
                  softmax_nomax=True, up_impl="phase")
    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.1,
                    in_channels=3, resolution=32, **kw)
    sampler = VARSampler(net, n_timesteps=T, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    vkw = {"dtype": jnp.bfloat16} if "_v" in VARIANT else {}
    value = TimeIndependentValue(net=IGEBMEncoder(nh=128, keepdim=False,
                                                  learn_out_scale=True,
                                                  **vkw))
    chunks = int(VARIANT.rsplit("_c", 1)[1]) if "_c" in VARIANT else 1
    # variants: base | levers | levers_c2 | levers_c4 | levers_v_c2 (+bf16 value)
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

    print(f"[{time.strftime('%H:%M:%S')}] {VARIANT}: compiling...",
          flush=True)
    state, m = trainer.train_step(state, img, key)
    float(m["sampler/sampler_loss_"])
    for i in range(3):
        state, m = trainer.train_step(state, img,
                                      jax.random.fold_in(key, i))
    float(m["sampler/sampler_loss_"])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, m = trainer.train_step(state, img,
                                      jax.random.fold_in(key, 100 + i))
    float(m["sampler/sampler_loss_"])  # host fetch closes the window
    dt = time.perf_counter() - t0
    print(f"{VARIANT:10s} {dt/n*1000:7.1f} ms/step "
          f"({B*n/dt:6.1f} img/s trained)", flush=True)


if __name__ == "__main__":
    main()
