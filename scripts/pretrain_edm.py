"""Native EDM denoising pretrain for a (small) ADM net — the starting
checkpoint for the Cond-family convergence run (CONVERGENCE.md §7,
VERDICT r4 task 3).

Mirrors what the reference workflow assumes exists before DxMI fine-
tuning (a pretrained EDM checkpoint, /root/reference/train_image_large.
py:130-140) and what the round-4 torch fixture's stage 1 did
(scripts/make_torch_adm_fixture.py: EDM lognormal-sigma denoising
loss), but in JAX on the structured synthetic class data, so it runs on
chip in seconds.  Saves EDMSampler params (net + fresh log_betas) as a
msgpack for ``train_image_large --training.pretrained_path``.
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
    p.add_argument("--config", required=True,
                   help="run config YAML with diffusion: + sampler: blocks")
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--log_every", type=int, default=50)
    args = p.parse_args()

    import optax

    from dxmi_tpu import config as cfglib
    from dxmi_tpu.data.synthetic import structured_class_images
    from dxmi_tpu.samplers.edm import EDMSampler
    from dxmi_tpu.trainers.distill import training_losses
    from dxmi_tpu.utils import checkpoint as ckptlib

    sys.path.insert(0, _bench_common.REPO)
    from train_image_large import build_sampler

    cfg = cfglib.load_yaml(args.config)
    key = jax.random.key(args.seed)
    key, bk = jax.random.split(key)
    sampler, sp = build_sampler(cfg, bk)
    net, diffusion = sampler.net, sampler.diffusion
    n_class = int(cfg["sampler"].get("num_classes") or 0)
    class_cond = bool(cfg["sampler"].get("class_cond"))
    res = int(cfg["diffusion"]["image_size"])

    images, labels = structured_class_images(
        args.data_size, res, max(n_class, 1), seed=args.seed)
    images = jnp.asarray(images)
    labels = jnp.asarray(labels)

    opt = optax.adam(args.lr)
    ost = opt.init(sp["net"])

    @jax.jit
    def update(net_params, ost, x0, y, key):
        k_sig, k_loss = jax.random.split(key)
        # EDM lognormal sigma draw (P_mean=-1.2, P_std=1.2) — the
        # fixture recipe's draw (make_torch_adm_fixture.py stage 1)
        sig = jnp.exp(jax.random.normal(k_sig, (x0.shape[0],)) * 1.2 - 1.2)

        def loss_fn(p):
            terms = training_losses(diffusion, net, p, x0, sig, key=k_loss,
                                    y=y if class_cond else None, train=True)
            return terms["loss"].mean()

        loss, g = jax.value_and_grad(loss_fn)(net_params)
        up, ost2 = opt.update(g, ost, net_params)
        return optax.apply_updates(net_params, up), ost2, loss

    rng = np.random.RandomState(args.seed)
    for it in range(args.steps):
        idx = rng.randint(0, len(images), args.batch)
        key, k = jax.random.split(key)
        sp["net"], ost, loss = update(sp["net"], ost, images[idx],
                                      labels[idx], k)
        if it % args.log_every == 0 or it == args.steps - 1:
            print(f"pretrain {it:5d}  edm-loss {float(loss):.4f}",
                  flush=True)

    ckptlib.save_checkpoint(args.out, sp, meta={"pretrain_steps": args.steps})
    print(f"saved pretrained EDM sampler to {args.out}")


if __name__ == "__main__":
    main()
