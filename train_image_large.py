"""DxMI training for ImageNet64 / LSUN on TPU (EDM backbone).

Mirrors the reference flow (/root/reference/train_image_large.py): build
the ADM U-Net + Karras denoiser, load the pretrained EDM checkpoint, wrap
as a T-step Euler-ancestral policy, and run the conditional DxMI loop:

    sample -> update_f_v -> update_sampler (full-buffer sweep)

with periodic on-device FID against VIRTUAL_* reference statistics.

    python train_image_large.py --config configs/imagenet64/T10.yaml \
        --dataset configs/imagenet64/imagenet64.yaml --run myrun

TPU-native: bf16 torso (no loss-scaling machinery), one jitted program per
phase, SPMD over all visible devices.
"""
from __future__ import annotations

import argparse
import os
import time

import jax

from dxmi_tpu.runtime import init_runtime

init_runtime()  # DXMI_PLATFORM override + persistent compile cache

import jax.numpy as jnp
import numpy as np

from dxmi_tpu import config as cfglib
from dxmi_tpu.config import instantiate
from dxmi_tpu.data.image_folder import load_data
from dxmi_tpu.models.unet_adm import create_unet_adm
from dxmi_tpu.parallel import create_mesh, replicate
from dxmi_tpu.parallel.mesh import global_batch
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.utils import checkpoint as ckptlib
from dxmi_tpu.utils.logging import BaseLogger, expand_metrics


def print0(*a, **k):
    if jax.process_index() == 0:
        print(*a, **k, flush=True)


def build_sampler(cfg, key, up_impl=None, attn_impl=None):
    dcfg = dict(cfg["diffusion"])
    sigma_min = dcfg.pop("sigma_min", 0.002)
    sigma_max = dcfg.pop("sigma_max", 80.0)
    weight_schedule = dcfg.pop("weight_schedule", "uniform")
    distillation = dcfg.pop("distillation", False)
    net = create_unet_adm(**dcfg, up_impl=up_impl, attn_impl=attn_impl)
    denoiser = KarrasDenoiser(sigma_min=sigma_min, sigma_max=sigma_max,
                              weight_schedule=weight_schedule,
                              distillation=distillation)
    sampler = EDMSampler(net, denoiser, **cfg["sampler"])
    params = sampler.init_params(key)

    ckpt_path = cfg["training"].get("pretrained_path")
    if ckpt_path and os.path.exists(ckpt_path):
        if ckpt_path.endswith(".msgpack"):
            # pre-converted / previously-trained dxmi_tpu params
            params = ckptlib.load_sampler_params(ckpt_path, current=params)
        else:
            from dxmi_tpu.utils import convert

            state_np = ckptlib.load_torch_checkpoint(ckpt_path)
            state_np.pop("__meta__", None)
            converted = convert.convert_unet_adm(state_np)
            params["net"] = jax.tree.map(jnp.asarray, converted["params"])
            if "log_betas" in converted:
                params["log_betas"] = jnp.asarray(converted["log_betas"])
        print0(f"pretrained EDM loaded from {ckpt_path}")
    elif ckpt_path:
        print0(f"WARNING: pretrained ckpt {ckpt_path} missing; random init")
    return sampler, params


def maybe_fid_state(cfg):
    """Reference stats (VIRTUAL_*.npz) + Inception weights, if on disk."""
    from dxmi_tpu.fid import runner as fid_runner

    name = cfg["data"]["name"]
    stats_candidates = [
        f"datasets/VIRTUAL_{name}_labeled.npz",
        f"datasets/VIRTUAL_{name}.npz",
        "datasets/VIRTUAL_imagenet64_labeled.npz" if "imagenet" in name else
        "datasets/VIRTUAL_lsun_bedroom256.npz",
    ]
    w = fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
    s = fid_runner._find(tuple(stats_candidates))
    if w is None or s is None:
        return None
    return fid_runner.build_fid_state(w, s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--run", default="run")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--fake_data", action="store_true")
    p.add_argument("--fake_data_size", type=int, default=1024,
                   help="finite structured-pool size for --fake_data")
    p.add_argument("--wandb", action="store_true",
                   help="log to wandb with the reference's project naming "
                        "(requires wandb installed)")
    p.add_argument("--data_workers", type=int, default=4,
                   help="decode threads for the image-folder loader "
                        "(0 = synchronous)")
    p.add_argument("--resume", action="store_true",
                   help="resume full train state from the run dir")
    p.add_argument("--save_state_every", type=int, default=500)
    p.add_argument("--up_impl", default=None,
                   choices=["phase", "resize"],
                   help="decoder upsample in TRAINING: 'phase' = the "
                        "exact phase decomposition (1669.6 -> 1638.1 "
                        "ms/step ImageNet64 cond, -1.9%%, PERF.md r4; "
                        "gradients tested); default keeps reference op "
                        "order (DXMI_UP_IMPL env also honored)")
    p.add_argument("--gn_stats", default=None,
                   choices=["fp32", "bf16_onepass"],
                   help="GroupNorm statistics in TRAINING: bf16_onepass "
                        "+ --up_impl phase measured 1669.6 -> 1551.7 "
                        "ms/step ImageNet64 cond (-7.1%%, PERF.md r4); "
                        "default keeps fp32 parity stats (DXMI_GN_STATS "
                        "env also honored)")
    p.add_argument("--attn_impl", default=None,
                   choices=["einsum", "flash", "fused_train"],
                   help="attention in TRAINING: 'fused_train' = the "
                        "whole-block fused Pallas kernel with its real "
                        "fused backward (ops/attn_block.py "
                        "fused_attn_block_train) on the maps its gate "
                        "admits; default keeps the bf16-mode flash / "
                        "fp32 einsum selection (DXMI_FUSED_ATTN=train "
                        "env also honored)")
    args, unknown = p.parse_known_args()

    d_cmd = cfglib.parse_nested_args(cfglib.parse_unknown_args(unknown))
    cfg = cfglib.merge(cfglib.load_yaml(args.config),
                       cfglib.load_yaml(args.dataset), d_cmd)
    print0(cfglib.to_yaml(cfg))

    tr = cfg["training"]
    seed = int(tr["seed"])
    key = jax.random.fold_in(jax.random.key(seed), jax.process_index())

    mesh = create_mesh()
    batchsize = int(tr["batchsize"])
    print0(f"SPMD over {mesh.devices.size} device(s)")

    key, bk = jax.random.split(key)
    if args.gn_stats:
        os.environ["DXMI_GN_STATS"] = args.gn_stats
    sampler, sampler_params = build_sampler(cfg, bk, up_impl=args.up_impl,
                                            attn_impl=args.attn_impl)
    value = instantiate(cfg["value"])
    trainer = instantiate(cfg["trainer"], batchsize=batchsize,
                          n_timesteps=cfg["sampler"]["n_timesteps"])
    trainer.set_models(sampler, value, lr=float(tr["lr"]),
                       v_lr=float(tr["v_lr"]),
                       beta_lr=float(tr.get("beta_lr") or tr["lr"]),
                       # in-place buffer reuse: halves peak HBM for the
                       # 300-500M EDM models on a single chip
                       donate=True)

    h, w, c = sampler.sample_shape
    key, vk = jax.random.split(key)
    v_vars = jax.jit(value.init)(vk, jnp.zeros((1, h, w, c)),
                                 jnp.zeros((1,), jnp.int32))
    state = replicate(mesh, trainer.init_state(
        sampler_params, v_vars["params"], v_stats=v_vars.get("sn_stats")))

    class_cond = bool(cfg["sampler"].get("class_cond"))
    if args.fake_data:
        # class-structured finite pool (not uniform noise): a learnable
        # distribution so convergence runs on fake data are meaningful
        # (data/synthetic.structured_class_images — the golden-ADM-
        # fixture construction); --fake_data_size bounds it
        from dxmi_tpu.data.synthetic import structured_class_images

        pool_x, pool_y = structured_class_images(
            max(args.fake_data_size, batchsize), h,
            max(sampler.num_classes, 1), seed=seed)

        def fake_gen():
            rng = np.random.RandomState(seed)
            while True:
                idx = rng.randint(0, len(pool_x), batchsize)
                extra = ({"y": pool_y[idx]} if class_cond else {})
                yield pool_x[idx], extra
        data = fake_gen()
        print0(f"using structured fake data ({len(pool_x)} images)")
    else:
        data = load_data(
            data_dir=cfg["data"]["data_dir"], batch_size=batchsize,
            image_size=int(cfg["data"]["image_size"]),
            class_cond=class_cond,
            cachefile=cfg["data"].get("cachefile"),
            deterministic=bool(cfg["data"].get("deterministic", False)),
            seed=seed, process_index=jax.process_index(),
            process_count=jax.process_count(),
            # threaded decode + prefetch: overlap input with device compute
            # (the reference's DataLoader workers, train_image_large.py:178-204)
            num_workers=args.data_workers)

    model_cfg_name = os.path.basename(args.config).split(".")[0]
    logdir = os.path.join(f"results/{cfg['data']['name']}/{model_cfg_name}",
                          args.run)
    logger = BaseLogger(None)
    if jax.process_index() == 0:
        os.makedirs(logdir, exist_ok=True)
        cfglib.save_yaml(cfg, os.path.join(logdir, "config.yaml"))
        use_wandb = False
        if args.wandb:
            # project naming parity (reference train_image_large.py:217-222)
            from dxmi_tpu.utils.logging import init_wandb

            proj = (f"dxmi_{cfg['data']['name']}"
                    f"_T{cfg['sampler']['n_timesteps']}")
            use_wandb = init_wandb(proj, f"{model_cfg_name}_{args.run}",
                                   logdir, dict(cfg)) is not None
        writer = None
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=logdir)
        except ImportError:
            pass
        logger = BaseLogger(writer, use_wandb=use_wandb)

    from dxmi_tpu.samplers import sample_chunked

    # sample_chunks defaults to 1 here (the large-model cond step is
    # compute-ceiling-bound and flat in batch, PERF.md); configs may pin
    # trainer.sample_chunks to chunk the trajectory-sampling phase
    sample_fn = jax.jit(lambda p, k: sample_chunked(
        sampler, p, k, batchsize, getattr(trainer, "sample_chunks", 1)))
    fid_state = maybe_fid_state(cfg)
    best_fid = float("inf")
    start_iter = 0
    if args.resume and os.path.exists(os.path.join(logdir, "train_state.msgpack")):
        state, meta = ckptlib.load_train_state(logdir, state)
        start_iter = int(meta["i_iter"])
        best_fid = float(meta.get("best_fid", float("inf")))
        print0(f"resumed full train state at iter {start_iter}")
    fid_every = tr.get("fid_every")
    log_every = int(tr["log_every"])
    n_iter = int(tr["n_iter"]) if args.max_steps is None else args.max_steps

    t0 = time.time()
    for i_iter in range(start_iter, n_iter):
        if (fid_every and fid_state is not None
                and i_iter % int(fid_every) == 0):
            from dxmi_tpu.fid.runner import compute_fid_from_sampler

            key, fk = jax.random.split(key)
            fid = compute_fid_from_sampler(
                sampler, state.sampler_params, fk, fid_state,
                n_samples=int(tr["n_fid_samples"]),
                batch=int(tr["sampling_batchsize"]))
            print0(f"iter {i_iter} FID {fid}")
            if fid < best_fid and jax.process_index() == 0:
                best_fid = fid
                ckptlib.save_run_checkpoint(
                    logdir, "best", sampler_params=state.sampler_params,
                    v_params=state.v_params, v_stats=state.v_stats,
                    meta={"fid": fid, "i_iter": i_iter})
            logger.log({"FID_": fid, "Best_FID_": best_fid}, i_iter)

        x, extra = next(data)
        x = global_batch(mesh, np.asarray(x))
        y = (global_batch(mesh, np.asarray(extra["y"]))
             if "y" in extra else None)

        key, sk, uk, gk = jax.random.split(key, 4)
        d_sample = sample_fn(state.sampler_params, sk)
        traj = buflib.from_d_sample(d_sample)
        state, m_energy = trainer.update_f_v(state, x, traj, uk, y=y)
        state, m_sampler = trainer.update_sampler(state, traj, gk)

        if (i_iter and i_iter % int(args.save_state_every) == 0
                and jax.process_index() == 0):
            ckptlib.save_train_state(logdir, state, i_iter=i_iter, epoch=0,
                                     best_fid=best_fid)
        if i_iter % log_every == 0 and jax.process_index() == 0:
            d = {**expand_metrics(m_energy), **expand_metrics(m_sampler)}
            logger.log(d, i_iter)
            ips = (i_iter + 1) / (time.time() - t0)
            print0(f"iter {i_iter} d_loss={d['ebm/d_loss_']:.4f} "
                   f"sampler_loss={d['sampler/sampler_loss_']:.4f} "
                   f"({ips:.3f} it/s)")

    if jax.process_index() == 0:
        ckptlib.save_run_checkpoint(logdir, "last",
                                    sampler_params=state.sampler_params,
                                    v_params=state.v_params,
                                    v_stats=state.v_stats,
                                    meta={"i_iter": n_iter})
        ckptlib.save_train_state(logdir, state, i_iter=n_iter, epoch=0,
                                 best_fid=best_fid)
        print0("done")


if __name__ == "__main__":
    main()
