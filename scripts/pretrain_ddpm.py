"""DDPM eps-matching pretraining for the CIFAR U-Net sampler.

The reference assumes a DOWNLOADED pretrained DDPM checkpoint
(configs/cifar10/T10.yaml `training.sampler_ckpt`; README.md pretrained/
table) — the pretraining script itself is not in the reference repo.
This provides it natively: standard DDPM noise-prediction training on
the sampler's own q-process (same eps-matching as train_2d.py's
pretrain, at image scale), saving a .msgpack consumable by
`train_cifar10.py --training.sampler_ckpt <out>`.

Usage (chip):
  python scripts/pretrain_ddpm.py --out /tmp/pre_cifar.msgpack \
      --steps 3000 --batch 128 --fake_data
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax

if os.environ.get("DXMI_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--n_timesteps", type=int, default=10)
    p.add_argument("--seed", type=int, default=112233)
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--ch", type=int, default=128)
    p.add_argument("--log_every", type=int, default=200)
    args = p.parse_args()

    import optax

    from dxmi_tpu.data.cifar10 import CIFAR10, fake_cifar
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.utils import checkpoint as ckptlib

    if args.fake_data:
        ds = fake_cifar(max(args.batch * 4, 256), args.seed)
    else:
        ds = CIFAR10("datasets", train=True)
    images = ds.images.astype(np.float32) / 127.5 - 1.0  # [-1, 1] NHWC

    net = UNetSmall(ch=args.ch, out_ch=3, ch_mult=(1, 2, 2, 2),
                    num_res_blocks=2, attn_resolutions=(16,), dropout=0.1,
                    in_channels=3, resolution=32)
    sampler = VARSampler(net, n_timesteps=args.n_timesteps,
                         sample_shape=(3, 32, 32), trainable_beta="fix_last")
    key = jax.random.key(args.seed)
    key, k0 = jax.random.split(key)
    sp = sampler.init_params(k0)
    sch = sampler.schedule
    opt = optax.adam(args.lr)
    ost = opt.init(sp["net"])

    @jax.jit
    def update(net_params, ost, x0, key):
        k1, k2, k3 = jax.random.split(key, 3)
        i = jax.random.randint(k1, (x0.shape[0],), 0, args.n_timesteps)
        gbar = jnp.take(sch.gamma_bar,
                        args.n_timesteps - 1 - i)[:, None, None, None]
        eps = jax.random.normal(k2, x0.shape)
        x_t = jnp.sqrt(gbar) * x0 + jnp.sqrt(1 - gbar) * eps
        tau = jnp.take(sch.tau, i)

        def loss_fn(p):
            pred = net.apply({"params": p}, x_t, tau, deterministic=False,
                             rngs={"dropout": k3})
            return ((pred - eps) ** 2).mean()

        loss, g = jax.value_and_grad(loss_fn)(net_params)
        up, ost2 = opt.update(g, ost, net_params)
        return optax.apply_updates(net_params, up), ost2, loss

    rng = np.random.RandomState(args.seed)
    for it in range(args.steps):
        idx = rng.randint(0, len(images), args.batch)
        key, k = jax.random.split(key)
        sp["net"], ost, loss = update(sp["net"], ost,
                                      jnp.asarray(images[idx]), k)
        if it % args.log_every == 0 or it == args.steps - 1:
            print(f"step {it} eps-loss {float(loss):.4f}", flush=True)

    ckptlib.save_checkpoint(args.out, sp, meta={"pretrain_steps": args.steps})
    print(f"saved pretrained sampler to {args.out}")


if __name__ == "__main__":
    main()
