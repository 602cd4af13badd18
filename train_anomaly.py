"""DxMI anomaly detection: train a T-step sampler + separate energy/value
on nominal data, then score out-of-distribution inputs by energy.

The reference implements the algorithm (``DxMI_Trainer_EV``,
trainer.py:865-1058) and the AUROC utilities but ships no entry script
(README marks the anomaly experiments TODO, SURVEY.md §2.0). This is the
complete runnable pipeline:

    python train_anomaly.py --data_dir datasets/mvtec/bottle/train/good \
        --image_size 64 --n_iter 2000
    python train_anomaly.py --score --log_dir results/anomaly/run \
        --in_dir .../test/good --out_dir .../test/broken_large
"""
from __future__ import annotations

import argparse
import os

import jax

from dxmi_tpu.runtime import init_runtime

init_runtime()  # DXMI_PLATFORM override + persistent compile cache

import jax.numpy as jnp
import numpy as np

from dxmi_tpu import config as cfglib
from dxmi_tpu.data.image_folder import load_data
from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.unet_small import UNetSmall, UNetSmallEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.samplers.var import VARSampler
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi_ev import DxMITrainerEV
from dxmi_tpu.utils import checkpoint as ckptlib
from dxmi_tpu.utils.metrics import anomaly_scores_from_energy


def build(image_size: int, n_timesteps: int, nh: int = 64, ch: int = 64,
          spectral_norm: bool = False):
    net = UNetSmall(ch=ch, out_ch=3, ch_mult=(1, 2, 2), num_res_blocks=1,
                    attn_resolutions=(image_size // 4,), dropout=0.0,
                    in_channels=3, resolution=image_size)
    sampler = VARSampler(net, n_timesteps=n_timesteps,
                         sample_shape=(3, image_size, image_size),
                         trainable_beta=True)
    # time-DEPENDENT value (the EV setting assumes one,
    # trainer.py:879-880) + separate IGEBM energy
    value = UNetSmallEncoder(ch=ch // 2, out_ch=1, ch_mult=(1, 2),
                             num_res_blocks=1,
                             attn_resolutions=(), dropout=0.0,
                             in_channels=3, resolution=image_size)
    energy = IGEBMEncoder(in_chan=3, out_chan=1, keepdim=False,
                          learn_out_scale=True, nh=nh,
                          use_spectral_norm=spectral_norm)
    return net, sampler, value, energy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_timesteps", type=int, default=10)
    p.add_argument("--n_iter", type=int, default=2000)
    p.add_argument("--batchsize", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--v_lr", type=float, default=1e-4)
    p.add_argument("--f_lr", type=float, default=1e-4)
    p.add_argument("--tau1", type=float, default=0.01)
    p.add_argument("--tau2", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--run", default="run")
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--spectral_norm", action="store_true",
                   help="spectral-normalize the energy net (IGEBM-style)")
    p.add_argument("--log_every", type=int, default=50)
    # scoring mode
    p.add_argument("--score", action="store_true")
    p.add_argument("--log_dir")
    p.add_argument("--in_dir", help="nominal test images")
    p.add_argument("--out_dir", help="anomalous test images")
    args = p.parse_args()

    if args.score:
        return score(args)

    key = jax.random.key(args.seed)
    B = args.batchsize
    res = args.image_size
    net, sampler, value, energy = build(res, args.n_timesteps,
                                        spectral_norm=args.spectral_norm)

    trainer = DxMITrainerEV(batchsize=B, tau1=args.tau1, tau2=args.tau2,
                            n_timesteps=args.n_timesteps,
                            use_sampler_beta=True, adavelreg=0.99)
    trainer.set_models(sampler, value, energy, lr=args.lr, v_lr=args.v_lr,
                       f_lr=args.f_lr)

    key, k1, k2, k3 = jax.random.split(key, 4)
    sp = sampler.init_params(k1)
    x0 = jnp.zeros((1, res, res, 3))
    vv = value.init(k2, x0, jnp.zeros((1,), jnp.float32))
    fv = energy.init(k3, x0)
    state = trainer.init_state_ev(sp, vv["params"], fv["params"],
                                  v_stats=vv.get("sn_stats"),
                                  f_stats=fv.get("sn_stats"))

    if args.fake_data:
        def gen():
            rng = np.random.RandomState(args.seed)
            while True:
                yield rng.rand(B, res, res, 3).astype(np.float32) * 2 - 1, {}
        data = gen()
    elif args.data_dir.endswith((".pth", ".pt")) or os.path.isfile(
            os.path.join(args.data_dir, "train_data.pth")):
        # the reference README's MVTec layout: datasets/mvtec/train_data.pth
        from dxmi_tpu.data.tensor_file import tensor_batches

        path = (args.data_dir if args.data_dir.endswith((".pth", ".pt"))
                else os.path.join(args.data_dir, "train_data.pth"))
        data = tensor_batches(path, B, seed=args.seed, image_size=res)
    else:
        data = load_data(args.data_dir, B, res, seed=args.seed)

    sample_fn = jax.jit(lambda p, k: sampler.sample(p, k, B))
    logdir = os.path.join("results/anomaly", args.run)
    os.makedirs(logdir, exist_ok=True)
    cfglib.save_yaml({"image_size": res, "n_timesteps": args.n_timesteps,
                      "spectral_norm": bool(args.spectral_norm)},
                     os.path.join(logdir, "config.yaml"))

    for i in range(args.n_iter):
        x, _ = next(data)
        key, sk, uk, gk = jax.random.split(key, 4)
        d = sample_fn(state.sampler_params, sk)
        traj = buflib.from_d_sample(d)
        state, m1 = trainer.update_f_v(state, jnp.asarray(x), traj, uk)
        state, m2 = trainer.update_sampler(state, traj, gk, n_generator=1)
        if i % args.log_every == 0:
            print(f"iter {i} d_loss={float(m1['ebm/d_loss_']):.4f} "
                  f"sampler_loss={float(m2['sampler/sampler_loss_']):.4f}",
                  flush=True)

    ckptlib.save_run_checkpoint(logdir, "last",
                                sampler_params=state.sampler_params,
                                v_params=state.v_params,
                                f_params=state.f_params,
                                v_stats=state.v_stats,
                                f_stats=state.f_stats)
    print(f"saved to {logdir}")


def score(args):
    """Energy-based anomaly scoring of two image directories."""
    from dxmi_tpu.fid.image_dir import dir_activations, list_images, load_batch

    cfg = cfglib.load_yaml(os.path.join(args.log_dir, "config.yaml"))
    res = int(cfg["image_size"])
    _, _, _, energy = build(res, int(cfg["n_timesteps"]),
                            spectral_norm=bool(cfg.get("spectral_norm", False)))
    ck = ckptlib.load_checkpoint(
        os.path.join(args.log_dir, "energy_last.msgpack"))
    variables = {"params": jax.tree.map(jnp.asarray, ck["params"])}
    if "sn_stats" in ck:
        variables["sn_stats"] = jax.tree.map(jnp.asarray, ck["sn_stats"])
    f = jax.jit(lambda x: energy.apply(variables, x).squeeze(-1))

    def dir_scores(path):
        files = list_images(path)
        out = []
        for i in range(0, len(files), 32):
            x = load_batch(files[i:i + 32]) * 2.0 - 1.0
            if x.shape[1] != res:
                import jax.image

                x = np.asarray(jax.image.resize(
                    jnp.asarray(x), (len(x), res, res, 3), "bilinear"))
            out.append(np.asarray(f(jnp.asarray(x))))
        return np.concatenate(out)

    e_in = dir_scores(args.in_dir)
    e_out = dir_scores(args.out_dir)
    d = anomaly_scores_from_energy(e_in, e_out)
    print(f"AUROC: {d['auroc']:.4f}  AUPR: {d['aupr']:.4f}")


if __name__ == "__main__":
    main()
