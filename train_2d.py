"""DxMI training on 2D synthetic data (8gaussians / 2spirals /
checkerboard).

The reference marks this entry TODO (README.md:45-46) while shipping the
data (loader/synthetic.py) and full trainer support; this is the complete
runnable experiment. Cheap enough to be the framework's end-to-end smoke:

    python train_2d.py --data 8gaussians --n_iter 2000

Uses the VARSampler (T-step DDPM policy) over 2-vectors with an EpsMLP
policy net and a time-dependent ValueMLP as value+energy.
"""
from __future__ import annotations

import argparse
import os

import jax

from dxmi_tpu.runtime import init_runtime

init_runtime()  # DXMI_PLATFORM override + persistent compile cache

import jax.numpy as jnp
import numpy as np

from dxmi_tpu.data.synthetic import pdf_8gaussian, sample2d
from dxmi_tpu.models.mlp import EpsMLP, ValueMLP
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi import DxMITrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="8gaussians",
                   choices=["8gaussians", "2spirals", "checkerboard"])
    p.add_argument("--n_timesteps", type=int, default=10)
    p.add_argument("--n_iter", type=int, default=2000)
    p.add_argument("--batchsize", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--v_lr", type=float, default=1e-4)
    p.add_argument("--beta_lr", type=float, default=1e-4)
    p.add_argument("--tau1", type=float, default=0.1)
    p.add_argument("--tau2", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain_iters", type=int, default=1000,
                   help="DDPM eps-matching pretraining of the policy")
    p.add_argument("--eval_every", type=int, default=0,
                   help="evaluate mean true-pdf log-likelihood every N "
                        "iters (8gaussians only); 0 = final only")
    p.add_argument("--eval_n", type=int, default=2000)
    p.add_argument("--curve_out", default="",
                   help="write the (iter, loglik) curve to this JSON")
    p.add_argument("--pretrain_cache", default="",
                   help="msgpack path: load the pretrained policy if "
                        "present, else pretrain and save it there")
    p.add_argument("--out", default="results/2d")
    args = p.parse_args()

    key = jax.random.key(args.seed)
    rng = np.random.RandomState(args.seed)

    net = EpsMLP()
    sampler = VARSampler(net, n_timesteps=args.n_timesteps, sample_shape=(2,),
                         trainable_beta="fix_last")
    value = ValueMLP(time_dependent=True)
    trainer = DxMITrainer(batchsize=args.batchsize, tau1=args.tau1,
                          tau2=args.tau2, gamma=1.0,
                          n_timesteps=args.n_timesteps,
                          use_sampler_beta=True, adavelreg=0.99,
                          time_cost=0.0, time_cost_sig=1.0)
    trainer.set_models(sampler, value, lr=args.lr, v_lr=args.v_lr,
                       beta_lr=args.beta_lr)

    key, k1, k2 = jax.random.split(key, 3)
    sp = sampler.init_params(k1)
    vp = value.init(k2, jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32))["params"]

    # ---- DDPM pretraining of the policy (DxMI fine-tunes a pretrained
    # sampler; for 2D we pretrain in-process with simple eps-matching on
    # the sampler's own q-process) ----
    cache_hit = False
    if args.pretrain_cache and os.path.exists(args.pretrain_cache):
        import flax.serialization as fser

        with open(args.pretrain_cache, "rb") as f:
            sp["net"] = fser.from_bytes(sp["net"], f.read())
        cache_hit = True
        print(f"pretrained policy loaded from {args.pretrain_cache}")
    if args.pretrain_iters > 0 and not cache_hit:
        import optax

        sch = sampler.schedule
        opt = optax.adam(1e-3)
        ost = opt.init(sp["net"])

        # host loop with fresh numpy data each step
        @jax.jit
        def pre_update(net_params, ost, x0, key):
            k1, k2 = jax.random.split(key)
            i = jax.random.randint(k1, (x0.shape[0],), 0, args.n_timesteps)
            gbar = jnp.take(sch.gamma_bar, args.n_timesteps - 1 - i)[:, None]
            eps = jax.random.normal(k2, x0.shape)
            x_t = jnp.sqrt(gbar) * x0 + jnp.sqrt(1 - gbar) * eps
            tau = jnp.take(sch.tau, i)

            def loss_fn(p):
                pred = net.apply({"params": p}, x_t, tau)
                return ((pred - eps) ** 2).mean()

            loss, g = jax.value_and_grad(loss_fn)(net_params)
            up, ost2 = opt.update(g, ost, net_params)
            return optax.apply_updates(net_params, up), ost2, loss

        for i in range(args.pretrain_iters):
            x0 = jnp.asarray(sample2d(args.data, args.batchsize, rng))
            key, k = jax.random.split(key)
            sp["net"], ost, loss = pre_update(sp["net"], ost, x0, k)
        print(f"pretrain done, eps-loss {float(loss):.4f}")
        if args.pretrain_cache:
            import flax.serialization as fser

            os.makedirs(os.path.dirname(args.pretrain_cache) or ".",
                        exist_ok=True)
            with open(args.pretrain_cache, "wb") as f:
                f.write(fser.to_bytes(sp["net"]))
            print(f"pretrained policy saved to {args.pretrain_cache}")

    state = trainer.init_state(sp, vp)
    sample_fn = jax.jit(lambda p, k: sampler.sample(p, k, args.batchsize))

    # true-pdf likelihood eval (the training-convergence evidence: the
    # reference's image loop drives FID down and gates best checkpoints,
    # train_cifar10.py:386-442; the 2D analogue is exact likelihood)
    eval_sample = jax.jit(lambda p, k: sampler.sample(p, k, args.eval_n))
    ekey = jax.random.key(args.seed + 12345)

    def eval_ll(params, i):
        d = eval_sample(params, jax.random.fold_in(ekey, i))
        s = np.asarray(d["sample"])
        return float(np.log(pdf_8gaussian(s) + 1e-12).mean())

    curve = []
    do_eval = args.eval_every > 0 and args.data == "8gaussians"
    if do_eval:
        ll0 = eval_ll(state.sampler_params, 0)
        curve.append({"iter": 0, "loglik": ll0})
        print(f"iter 0 (post-pretrain) loglik={ll0:.4f}")

    for i_iter in range(args.n_iter):
        x_data = jnp.asarray(sample2d(args.data, args.batchsize, rng))
        key, sk, uk, gk = jax.random.split(key, 4)
        d_sample = sample_fn(state.sampler_params, sk)
        traj = buflib.from_d_sample(d_sample)
        state, m1 = trainer.update_f_v(state, x_data, traj, uk)
        state, m2 = trainer.update_sampler(state, traj, gk, n_generator=1)
        if i_iter % 200 == 0:
            print(f"iter {i_iter} d_loss={float(m1['ebm/d_loss_']):.4f} "
                  f"sampler_loss={float(m2['sampler/sampler_loss_']):.4f}")
        if do_eval and (i_iter + 1) % args.eval_every == 0:
            ll = eval_ll(state.sampler_params, i_iter + 1)
            curve.append({"iter": i_iter + 1, "loglik": ll})
            print(f"iter {i_iter + 1} loglik={ll:.4f}")

    # ---- evaluation: mean log-likelihood of samples under the true pdf ----
    key, ek = jax.random.split(key)
    d = sampler.sample(state.sampler_params, ek, 2000)
    samples = np.asarray(d["sample"])
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, f"{args.data}_samples.npy"), samples)
    if args.data == "8gaussians":
        ll = float(np.log(pdf_8gaussian(samples) + 1e-12).mean())
        print(f"mean log-likelihood under true pdf: {ll:.4f}")
    if args.curve_out and curve:
        import json

        os.makedirs(os.path.dirname(args.curve_out) or ".", exist_ok=True)
        with open(args.curve_out, "w") as f:
            json.dump({"config": vars(args), "curve": curve}, f, indent=1)
        print(f"curve saved to {args.curve_out}")
    print(f"samples saved to {args.out}")


if __name__ == "__main__":
    main()
