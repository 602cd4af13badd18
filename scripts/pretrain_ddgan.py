"""Native DDGAN generator pretrain — the starting checkpoint for the
round-5 trained DDGAN fixture (VERDICT r4 Missing #2 / task 4).

The reference experiment starts from a published pretrained DDGAN
generator (configs/cifar10/T4_ddgan.yaml: ddgan_checkpoints/.../
netG_1200.pth — not in this zero-egress container, and the reference
snapshot ships no DDGAN module at all, SURVEY.md §2.0).  This pretrains
our reconstructed NCSN++ generator the denoising way: draw a DDGAN
discrete time t in {1..T}, diffuse x0 to x_t with the VP alpha-bar the
sampler's posterior assumes (samplers/ddgan.ddgan_schedule), and train
G(x_t, t-1, z) to predict x0 (MSE; z drawn per sample so the generator
learns to use — or ignore — its latent).  A blurry-but-functional
denoising generator is exactly the "under-pretrained sampler" the
convergence recipes start from (CONVERGENCE.md §4).
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
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--n_timesteps", type=int, default=4)
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--log_every", type=int, default=50)
    args = p.parse_args()

    import optax

    from dxmi_tpu.data.cifar10 import CIFAR10, fake_cifar
    from dxmi_tpu.models.ncsnpp import NCSNpp, NCSNppArgs
    from dxmi_tpu.samplers.ddgan import DDGANSampler, _vp_variance
    from dxmi_tpu.utils import checkpoint as ckptlib

    if args.fake_data:
        ds = fake_cifar(max(args.batch * 4, 1024), args.seed)
    else:
        ds = CIFAR10("datasets", train=True)
    images = ds.images.astype(np.float32) / 127.5 - 1.0  # [-1,1] NHWC

    net = NCSNpp(config=NCSNppArgs())
    sampler = DDGANSampler(net, n_timesteps=args.n_timesteps,
                           sample_shape=(3, 32, 32),
                           trainable_beta="fix_last", use_z=True)
    key = jax.random.key(args.seed)
    key, k0 = jax.random.split(key)
    sp = sampler.init_params(k0)

    # VP alpha-bar at the sampler's own discretisation (ddgan_schedule)
    T = args.n_timesteps
    t_grid = np.arange(0, T + 1, dtype=np.float64) / T
    t_grid = t_grid * (1.0 - 1e-3) + 1e-3
    alpha_bar_edges = 1.0 - _vp_variance(t_grid)
    betas = 1.0 - alpha_bar_edges[1:] / alpha_bar_edges[:-1]
    a_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)  # (T,)

    opt = optax.adam(args.lr)
    ost = opt.init(sp["net"])
    nz = sampler.nz

    @jax.jit
    def update(net_params, ost, x0, key):
        k_t, k_eps, k_z = jax.random.split(key, 3)
        B = x0.shape[0]
        ti = jax.random.randint(k_t, (B,), 0, T)         # DDGAN t-1 index
        ab = jnp.take(a_bar, ti)[:, None, None, None]
        eps = jax.random.normal(k_eps, x0.shape)
        x_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        z = jax.random.normal(k_z, (B, nz))

        def loss_fn(p):
            x0_hat = net.apply({"params": p}, x_t, ti.astype(jnp.float32), z)
            return ((x0_hat - x0) ** 2).mean()

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
            print(f"pretrain {it:5d}  x0-mse {float(loss):.4f}", flush=True)

    ckptlib.save_checkpoint(args.out, sp, meta={"pretrain_steps": args.steps})
    print(f"saved pretrained DDGAN sampler to {args.out}")


if __name__ == "__main__":
    main()
