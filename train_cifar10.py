"""DxMI training for CIFAR-10 on TPU.

Usage (mirrors the reference CLI, /root/reference/train_cifar10.py:1-10,
minus torchrun — SPMD over all visible devices is automatic):

    python train_cifar10.py --config configs/cifar10/T10.yaml \
        --dataset configs/cifar10/cifar10.yaml --run myrun \
        [--training.lr 1e-6 ...dot-key overrides]

Program shape per training step (one jitted program per phase):
    sample trajectory (lax.scan) -> buffer -> update_f_v -> update_sampler
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
from dxmi_tpu.data.cifar10 import EpochLoader, fake_cifar, get_dataset
from dxmi_tpu.parallel import create_mesh, replicate
from dxmi_tpu.parallel.mesh import global_batch
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.utils import checkpoint as ckptlib
from dxmi_tpu.utils.logging import BaseLogger, expand_metrics, make_grid, weight_norm_of


def print0(*args, **kwargs):
    if jax.process_index() == 0:
        print(*args, **kwargs, flush=True)


def rescale01(x):
    return (x + 1.0) / 2.0


def build(cfg, net_overrides=None, value_net_overrides=None):
    net = instantiate(cfg["sampler_net"], **(net_overrides or {}))
    sampler = instantiate(cfg["sampler"], net=net)
    vcfg = cfg["value"]
    if value_net_overrides:
        vcfg = {**vcfg, "net": {**vcfg["net"], **value_net_overrides}}
    value = instantiate(vcfg)
    trainer = instantiate(cfg["trainer"],
                          batchsize=cfg["training"]["batchsize"],
                          n_timesteps=cfg["sampler"]["n_timesteps"])
    trainer.set_models(sampler, value,
                       lr=float(cfg["training"]["lr"]),
                       v_lr=float(cfg["training"]["v_lr"]),
                       beta_lr=float(cfg["training"].get("beta_lr") or
                                     cfg["training"]["lr"]))
    # auto-chunk the trajectory-sampling phase from the round-4 in-step
    # A/Bs (scripts/bench_train_chunked.py + bench_train_r3.py levers_cN,
    # PERF.md): at global batch 128, 32-sized chunks win for the fp32
    # parity step (270/248/242 ms for 128/64/32) but 64-sized chunks win
    # under --fast_levers' bf16 torso (199.6 vs 205.8 ms) — residency
    # shifts with the compute dtype. A config trainer.sample_chunks pins.
    if trainer.sample_chunks == 1 and "sample_chunks" not in cfg["trainer"]:
        b = trainer.batchsize
        opt = 64 if net_overrides else 32
        if b > opt and b % opt == 0:
            trainer.sample_chunks = b // opt
    return sampler, value, trainer


def init_state(cfg, sampler, value, trainer, key):
    k1, k2 = jax.random.split(key)
    sp = sampler.init_params(k1)

    ckpt_path = cfg["training"].get("sampler_ckpt")
    if ckpt_path and os.path.exists(ckpt_path):
        if ckpt_path.endswith(".msgpack"):
            # pre-converted / previously-trained dxmi_tpu params
            sp = ckptlib.load_sampler_params(ckpt_path, current=sp)
        else:
            target = str(cfg["sampler_net"].get("_target_", ""))
            if "ncsnpp" in target.lower():
                raise SystemExit(
                    "sampler_ckpt: no torch->flax converter for the DDGAN "
                    "NCSN++ (the reference snapshot ships no module for it, "
                    "SURVEY.md §2.0, so dxmi_tpu's NCSNpp is a documented "
                    "reconstruction with its own param layout). Train from "
                    "scratch, or load a dxmi_tpu .msgpack checkpoint — see "
                    "docs/migration.md.")
            from dxmi_tpu.utils import convert

            state_np = ckptlib.load_torch_checkpoint(ckpt_path)
            state_np.pop("__meta__", None)
            converted = convert.convert_unet_small(state_np)
            sp["net"] = jax.tree.map(jnp.asarray, converted["params"])
            if "log_betas" in converted:
                sp["log_betas"] = jnp.asarray(converted["log_betas"])
        print0(f"Sampler checkpoint loaded from {ckpt_path}")
    elif ckpt_path:
        print0(f"WARNING: sampler ckpt {ckpt_path} not found; training from "
               "scratch (DxMI fine-tunes a pretrained sampler)")

    h, w, c = sampler.sample_shape
    x = jnp.zeros((1, h, w, c))
    vv = value.init(k2, x, jnp.zeros((1,), jnp.int32))
    vp = vv["params"]
    v_stats = vv.get("sn_stats")  # spectral-norm value nets

    v_ckpt = cfg["training"].get("value_ckpt")
    if v_ckpt and os.path.exists(v_ckpt):
        from dxmi_tpu.utils import convert

        state_np = ckptlib.load_torch_checkpoint(v_ckpt)
        state_np.pop("__meta__", None)
        wrapped = convert.wrap_value_params(convert.convert_igebm(state_np))
        vp = jax.tree.map(jnp.asarray, wrapped["params"])
        if "sn_stats" in wrapped:
            v_stats = jax.tree.map(jnp.asarray, wrapped["sn_stats"])
        print0(f"value checkpoint loaded from {v_ckpt}")

    return trainer.init_state(sp, vp, v_stats=v_stats)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--run", type=str, default="run")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="cap total train steps (smoke runs)")
    parser.add_argument("--fake_data", action="store_true",
                        help="use a synthetic dataset stand-in")
    parser.add_argument("--fake_data_size", type=int, default=None,
                        help="synthetic dataset size (default 4x batch); "
                             "larger values give longer epochs, fewer "
                             "epoch-boundary checkpoints/grids")
    parser.add_argument("--resume", action="store_true",
                        help="resume params+optimizer state from the run dir")
    parser.add_argument("--wandb", action="store_true",
                        help="log to wandb with the reference's project "
                             "naming (requires wandb installed)")
    parser.add_argument("--fast_levers", action="store_true",
                        help="apply the measured train-step levers to the "
                             "sampler net: bf16 torso + bf16 softmax + "
                             "nomax + phase upsample + bf16_onepass GN "
                             "stats — 266.6 -> 211.0 ms/step (-21%%) on "
                             "the full-size config (PERF.md round 4). "
                             "All levers are exact-math or bf16-precision-"
                             "class (gradients flow through each; "
                             "tests/test_upsample_phase.py); parity "
                             "defaults stay fp32. DXMI_TRAIN_LEVERS=1 "
                             "equivalently.")
    args, unknown = parser.parse_known_args()

    d_cmd = cfglib.parse_nested_args(cfglib.parse_unknown_args(unknown))
    cfg = cfglib.merge(cfglib.load_yaml(args.config),
                       cfglib.load_yaml(args.dataset), d_cmd)
    net_overrides = value_net_overrides = None
    if args.fast_levers or os.environ.get("DXMI_TRAIN_LEVERS") == "1":
        # execution-detail overrides (params stay fp32; the saved run-dir
        # config keeps the parity definition)
        os.environ.setdefault("DXMI_GN_STATS", "bf16_onepass")
        net_overrides = dict(dtype=jnp.bfloat16, softmax_f32=False,
                             softmax_nomax=True, up_impl="phase")
        value_net_overrides = dict(dtype=jnp.bfloat16)
        print0("fast_levers: bf16 sampler+value torso + nomax softmax + "
               "phase upsample + bf16_onepass GN stats + 64-chunk "
               "sampling (191.7 ms/step measured vs 266.6 parity, "
               "PERF.md r4)")
    print0(cfglib.to_yaml(cfg))

    tr_cfg = cfg["training"]
    seed = int(tr_cfg["seed"])
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, jax.process_index())

    mesh = create_mesh()
    n_dev = mesh.devices.size
    print0(f"SPMD over {n_dev} device(s): {mesh}")
    batchsize = int(tr_cfg["batchsize"])
    assert batchsize % n_dev == 0, "global batch must divide the mesh"

    sampler, value, trainer = build(cfg, net_overrides, value_net_overrides)
    key, init_key = jax.random.split(key)
    state = init_state(cfg, sampler, value, trainer, init_key)
    start_epoch, resume_iter, resume_best = 0, 0, float("inf")
    state_path = os.path.join(
        f"results/{cfg['data']['name']}/"
        f"{os.path.basename(args.config).split('.')[0]}", args.run,
        "train_state.msgpack")
    if args.resume and os.path.exists(state_path):
        state, meta = ckptlib.load_train_state(os.path.dirname(state_path), state)
        start_epoch = int(meta["epoch"])
        resume_iter = int(meta["i_iter"])
        resume_best = float(meta.get("best_fid", float("inf")))
        print0(f"resumed full train state at epoch {start_epoch}, "
               f"iter {resume_iter}")
    state = replicate(mesh, state)

    # data
    if args.fake_data:
        n_fake = args.fake_data_size or max(batchsize * 4, 256)
        train_set = fake_cifar(n_fake, seed)
        print0(f"using fake data stand-in ({n_fake} images)")
    else:
        train_set = get_dataset(cfg["data"]["name"], cfg["data"]["data_dir"])
    loader = EpochLoader(train_set, batch_size=batchsize // jax.process_count(),
                         seed=seed, process_index=jax.process_index(),
                         process_count=jax.process_count())

    # run dir
    model_cfg_name = os.path.basename(args.config).split(".")[0]
    logdir = os.path.join(f"results/{cfg['data']['name']}/{model_cfg_name}",
                          args.run)
    logger = BaseLogger(None)
    if jax.process_index() == 0:
        os.makedirs(logdir, exist_ok=True)
        cfglib.save_yaml(cfg, os.path.join(logdir, "config.yaml"))
        use_wandb = False
        if args.wandb:
            # project naming parity (reference train_cifar10.py:349-355)
            from dxmi_tpu.utils.logging import init_wandb

            proj = ("dxmi_cifar10_ddgan" if "ddgan" in model_cfg_name
                    else f"dxmi_cifar10_T{cfg['sampler']['n_timesteps']}")
            use_wandb = init_wandb(proj, f"{model_cfg_name}_{args.run}",
                                   logdir, dict(cfg)) is not None
        writer = None
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=logdir)
        except ImportError:
            pass
        logger = BaseLogger(writer, use_wandb=use_wandb)
        print0(f"run dir: {logdir}")

    from dxmi_tpu.samplers import sample_chunked

    sample_fn = jax.jit(lambda p, k: sample_chunked(
        sampler, p, k, batchsize, trainer.sample_chunks))
    grid_fn = jax.jit(lambda p, k: sampler.sample(p, k, 64)["sample"])

    from dxmi_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    n_critic = int(tr_cfg["n_critic"])
    n_generator = int(tr_cfg["n_generator"])
    log_every = int(tr_cfg["log_every"])
    fid_epoch = tr_cfg.get("fid_epoch")
    fid_every = tr_cfg.get("fid_every")
    assert fid_epoch is None or fid_every is None, \
        "cannot set both fid_epoch and fid_every (reference train_cifar10.py:251-253)"
    best_fid = resume_best
    fid_state = None

    def run_fid(tag_iter, epoch_no):
        nonlocal best_fid, fid_state, key
        from dxmi_tpu.fid import runner as fid_runner

        key, fk = jax.random.split(key)
        fid, fid_state = fid_runner.maybe_compute_fid(
            cfg, sampler, state.sampler_params, fk, fid_state)
        if fid is not None:
            print0(f"FID: {fid}")
            if fid < best_fid:
                best_fid = fid
                ckptlib.save_run_checkpoint(
                    logdir, "best", sampler_params=state.sampler_params,
                    v_params=state.v_params, v_stats=state.v_stats,
                    meta={"fid": fid, "epoch": epoch_no, "iter": tag_iter})
            logger.log({"FID_": fid, "Best_FID_": best_fid}, tag_iter)

    i_iter = resume_iter
    t_start = time.time()
    pending = []
    for epoch in range(start_epoch, int(tr_cfg["n_epochs"])):
        # per-epoch sample grid
        if jax.process_index() == 0:
            key, gk = jax.random.split(key)
            Xi = np.asarray(grid_fn(state.sampler_params, gk))
            img = make_grid(np.clip(rescale01(Xi), 0, 1))
            norm = float(np.linalg.norm(Xi.reshape(Xi.shape[0], -1),
                                        axis=1).mean())
            tag = "sample_init@" if epoch == 0 else "sample@"
            logger.log({tag: img, "sample_norm_": norm},
                       0 if epoch == 0 else i_iter)
            print0(f"epoch {epoch}")

        # periodic FID (only when the real dataset/stats are on disk)
        if fid_epoch is not None and epoch % int(fid_epoch) == 0:
            run_fid(i_iter, epoch)

        for step, (images, labels) in enumerate(loader.epoch(epoch)):
            assert images.max() <= 1.0 and images.min() >= 0.0
            images = global_batch(mesh, np.asarray(images) * 2.0 - 1.0)

            if fid_every is not None and i_iter % int(fid_every) == 0:
                run_fid(i_iter, epoch)

            key, sk, uk, gk2 = jax.random.split(key, 4)
            if n_critic == 1:
                # fused fast path: the whole DxMI iteration is ONE jitted
                # dispatch (sample -> buffer -> update_f_v -> update_sampler).
                # Only sync at log boundaries — dispatch pipelining hides
                # per-step latency (PERF.md: 420 -> 270 ms/step on-chip).
                with timer.phase("train_step"):
                    state, m_all = trainer.train_step(
                        state, images, sk, n_generator=n_generator)
                    if (step + 1) % log_every == 0:
                        jax.block_until_ready(m_all["sampler/sampler_loss_"])
                # fused metrics already hold both phases' keys
                m_energy, m_sampler = m_all, {}
                do_log = True
            else:
                with timer.phase("sample"):
                    d_sample = sample_fn(state.sampler_params, sk)
                    traj = buflib.from_d_sample(d_sample)
                    jax.block_until_ready(traj.state)
                pending.append(traj)
                with timer.phase("update_f_v"):
                    state, m_energy = trainer.update_f_v(state, images, traj, uk)
                    jax.block_until_ready(m_energy["ebm/d_loss_"])
                do_log = False

            if n_critic > 1 and (step + 1) % n_critic == 0:
                full = buflib.concat(*pending) if len(pending) > 1 else pending[0]
                with timer.phase("update_sampler"):
                    state, m_sampler = trainer.update_sampler(
                        state, full, gk2, n_generator=n_generator)
                    jax.block_until_ready(m_sampler["sampler/sampler_loss_"])
                pending = []
                do_log = True

            if do_log:
                if (step + 1) % log_every == 0 and jax.process_index() == 0:
                    d = {**expand_metrics(m_energy), **expand_metrics(m_sampler),
                         **timer.summary(),
                         "weight_norm/sampler_": weight_norm_of(
                             state.sampler_params),
                         "weight_norm/value_": weight_norm_of(state.v_params)}
                    timer.reset()
                    logger.log(d, i_iter)
                    phase_str = " ".join(
                        f"{k[len('time/'):-len('_ms_')]}={v:.0f}ms"
                        for k, v in d.items() if k.startswith("time/"))
                    sps = (i_iter + 1) / (time.time() - t_start)
                    print0(f"iter {i_iter} d_loss={d['ebm/d_loss_']:.4f} "
                           f"sampler_loss={d['sampler/sampler_loss_']:.4f} "
                           f"({sps:.2f} it/s) {phase_str}")
            i_iter += 1
            if args.max_steps is not None and i_iter >= args.max_steps:
                break
        if args.max_steps is not None and i_iter >= args.max_steps:
            break
        # preemption-safe full-state checkpoint at each epoch boundary
        if jax.process_index() == 0:
            ckptlib.save_train_state(logdir, state, i_iter=i_iter,
                                     epoch=epoch + 1, best_fid=best_fid)

    if jax.process_index() == 0:
        ckptlib.save_run_checkpoint(logdir, "last",
                                    sampler_params=state.sampler_params,
                                    v_params=state.v_params,
                                    v_stats=state.v_stats,
                                    meta={"epoch": epoch, "iter": i_iter})
        # full-state checkpoint so interrupted runs resume exactly
        ckptlib.save_train_state(logdir, state, i_iter=i_iter, epoch=epoch,
                                 best_fid=best_fid)
        print0(f"done: {i_iter} iters")


if __name__ == "__main__":
    main()
