"""Generate from a trained large-image DxMI run, with on-device FID or the
``--skip_fid`` streaming-PNG path (capability parity with
/root/reference/generate_large.py; hosts can't hold 50k x 256^2 images, so
the PNG path streams batches through a background writer).

    python generate_large.py --log_dir results/imagenet64/T10/run \
        [--n_generate 50000] [--batchsize 100] [--skip_fid] [--save_npz out.npz]
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
from dxmi_tpu.config import instantiate
from dxmi_tpu.models.unet_adm import create_unet_adm
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.utils import checkpoint as ckptlib
from generate_cifar10 import AsyncPNGWriter, to_uint8


def print0(*a, **k):
    if jax.process_index() == 0:
        print(*a, **k, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--sampler", default="best", choices=["best", "last"])
    p.add_argument("--n_sample", "--n_generate", dest="n_generate",
                   type=int, default=50000)
    p.add_argument("--batchsize", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="Value guidance scale, 0.0/unset for no guidance "
                        "(reference generate_large.py:90): samples via the "
                        "Cond trainer's value-guided path, loading "
                        "value_{best,last}.msgpack from the run dir")
    p.add_argument("--skip_fid", action="store_true",
                   help="stream PNGs to disk instead of computing FID")
    p.add_argument("--save_dir", default=None)
    p.add_argument("--save_npz", default=None,
                   help="also pack samples into an npz (evaluator input)")
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 sampling: static activation scales "
                        "calibrated from the loaded checkpoint; with the "
                        "fused attention kernel this also runs the "
                        "attention qkv/proj matmuls W8A8 in-kernel "
                        "(81.2 img/s ImageNet64 at batch 32, zero "
                        "incremental drift on the trained ADM fixture — "
                        "PERF.md round 4; DXMI_QUANT_ATTN=0 opts the "
                        "attention part out)")
    p.add_argument("--attn_impl", default="fused",
                   choices=["fused", "flash", "einsum"],
                   help="attention path for generation; 'fused' = the "
                        "whole-block Pallas kernel (+15%% over flash, "
                        "PERF.md), degrading per-shape to flash/einsum")
    p.add_argument("--up_impl", default="phase",
                   choices=["phase", "resize"],
                   help="decoder upsample: 'phase' = phase-decomposed "
                        "conv (exact algebra, 2.25x fewer MACs; +2.9%% "
                        "ImageNet64 / +6%% LSUN sampling, PERF.md); "
                        "'resize' = reference op order")
    p.add_argument("--gn_stats", default=None,
                   choices=["fp32", "bf16_onepass"],
                   help="GroupNorm statistics formulation: bf16_onepass "
                        "(bf16 reads, fp32 accumulation) is +7.4%% "
                        "ImageNet64 / +11.1%% LSUN sampling with drift "
                        "far below the reseed floor on the trained ADM "
                        "fixture (PERF.md round 4); 'fp32' restores "
                        "two-pass parity statistics")
    args, unknown = p.parse_known_args()
    # read at TRACE time by ops/groupnorm — set before any jit below.
    # Explicit --gn_stats wins; otherwise default bf16_onepass WITHOUT
    # clobbering a user-set DXMI_GN_STATS env var (setdefault, matching
    # DXMI_FUSED_NOMAX below and train_image_large — ADVICE r4).
    if args.gn_stats is not None:
        os.environ["DXMI_GN_STATS"] = args.gn_stats
    else:
        os.environ.setdefault("DXMI_GN_STATS", "bf16_onepass")
    # in-kernel nomax softmax for the fused attention kernels: exact
    # math (parity-tested), +3.6% ImageNet64 (PERF.md r4);
    # DXMI_FUSED_NOMAX=0 opts out
    os.environ.setdefault("DXMI_FUSED_NOMAX", "1")

    cfg = cfglib.load_yaml(os.path.join(args.log_dir, "config.yaml"))
    cfg = cfglib.merge(cfg, cfglib.parse_nested_args(
        cfglib.parse_unknown_args(unknown)))

    dcfg = dict(cfg["diffusion"])
    sigma_min = dcfg.pop("sigma_min", 0.002)
    sigma_max = dcfg.pop("sigma_max", 80.0)
    dcfg.pop("weight_schedule", None)
    distillation = dcfg.pop("distillation", False)
    net = create_unet_adm(**dcfg, quant_int8="static" if args.int8 else False,
                          attn_impl=args.attn_impl, up_impl=args.up_impl)
    denoiser = KarrasDenoiser(sigma_min=sigma_min, sigma_max=sigma_max,
                              distillation=distillation)
    sampler = EDMSampler(net, denoiser, **cfg["sampler"])

    ckpt, ckpt_path = ckptlib.load_run_checkpoint(
        args.log_dir, "sampler", args.sampler, torch_kind="unet_adm")
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    if "log_betas" not in params:  # base (pre-DxMI) EDM torch ckpt
        params = {**sampler.init_params(jax.random.key(0)), **params}
    print0(f"sampler loaded from {ckpt_path}")
    if "fid" in ckpt.get("meta", {}):
        print0(f"checkpoint FID {ckpt['meta']['fid']}")
    if args.int8:
        params = sampler.calibrate_quant(dict(params), jax.random.key(123),
                                         n_sample=8, n_rounds=2)
        print0("int8: static activation scales calibrated")

    # SPMD generation: batch sharded over this process's LOCAL devices (see
    # generate_cifar10.py; the reference uses one DDP process per GPU)
    from dxmi_tpu.parallel import create_mesh, data_sharding

    mesh = create_mesh(devices=jax.local_devices())
    out_sh = None
    if mesh.devices.size > 1 and args.batchsize % mesh.devices.size == 0:
        out_sh = data_sharding(mesh)

    if args.guidance_scale:
        # value-guided sampling (reference generate_large.py:29-30,132-146):
        # load the value function + Cond trainer, sample via sample_guidance
        value = instantiate(cfg["value"])
        trainer = instantiate(cfg["trainer"], batchsize=args.batchsize,
                              n_timesteps=cfg["sampler"]["n_timesteps"])
        trainer.set_models(sampler, value, lr=1e-8, v_lr=1e-5)
        v_ckpt, v_path = ckptlib.load_run_checkpoint(
            args.log_dir, "value", args.sampler, torch_kind="value")
        print0(f"value loaded from {v_path}")
        v_params = jax.tree.map(jnp.asarray, v_ckpt["params"])
        v_stats = (jax.tree.map(jnp.asarray, v_ckpt["sn_stats"])
                   if "sn_stats" in v_ckpt else None)
        state = trainer.init_state(params, v_params, v_stats=v_stats)
        trainer.guidance_scale = args.guidance_scale
        print0(f"value-guided sampling, scale={args.guidance_scale}")
        # state (not the loose params) carries the sampler weights here;
        # pass it as a jit argument so the call sites' params stay honest
        sample_fn = jax.jit(lambda st, k: trainer.sample_guidance(
            st, k, args.batchsize,
            guidance_scale=args.guidance_scale)["sample"],
            out_shardings=out_sh)
        params = state
    else:
        sample_fn = jax.jit(
            lambda p, k: sampler.sample(p, k, args.batchsize)["sample"],
            out_shardings=out_sh)

    key = jax.random.fold_in(jax.random.key(args.seed), jax.process_index())
    n_local = args.n_generate // jax.process_count()
    n_batches = n_local // args.batchsize

    writer = None
    if args.skip_fid or args.save_dir:
        save_dir = args.save_dir or os.path.join(
            args.log_dir, f"generated_{args.sampler}")
        os.makedirs(save_dir, exist_ok=True)
        writer = AsyncPNGWriter(save_dir, prefix=str(jax.process_index()))

    acts = []
    npz_writer = None
    if args.save_npz and jax.process_index() == 0:
        from dxmi_tpu.utils.npz_stream import NpzStreamWriter

        h, w_, c = sampler.sample_shape
        npz_writer = NpzStreamWriter(args.save_npz,
                                     n_total=n_batches * args.batchsize,
                                     shape_tail=(h, w_, c))
    fid_state = None
    if not args.skip_fid:
        from dxmi_tpu.fid import runner as fid_runner

        name = cfg["data"]["name"]
        s = fid_runner._find((
            f"datasets/VIRTUAL_{name}_labeled.npz",
            f"datasets/VIRTUAL_{name}.npz",
            "datasets/VIRTUAL_imagenet64_labeled.npz",
            "datasets/VIRTUAL_lsun_bedroom256.npz"))
        w = fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
        if w and s:
            fid_state = fid_runner.build_fid_state(w, s)
        else:
            print0("FID assets missing; falling back to PNG dump")

    i_img = 0
    for i in range(n_batches):
        key, k = jax.random.split(key)
        x = sample_fn(params, k)
        if fid_state is not None:
            x01 = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
            acts.append(np.asarray(fid_state.extract_fn(x01)))
        xu8 = to_uint8(np.asarray(x))
        if writer is not None:
            writer.put_batch(i_img, xu8)
        if npz_writer is not None:
            npz_writer.write(xu8)
        i_img += len(xu8)
        if (i + 1) % 10 == 0:
            print0(f"{i_img}/{n_local}")

    if writer is not None:
        writer.close()
        print0(f"wrote {i_img} PNGs")
        from dxmi_tpu.parallel import sync_hosts

        sync_hosts("generate_pngs")  # reference barrier before rank-0 reads
    if npz_writer is not None:
        npz_writer.close()
        print0(f"saved npz to {args.save_npz} ({npz_writer.n} images, "
               "streamed)")

    if fid_state is not None and jax.process_index() == 0:
        from dxmi_tpu.fid import stats as stats_lib

        a = np.concatenate(acts)
        m1, s1 = stats_lib.activation_statistics(a)
        fid = stats_lib.frechet_distance(m1, s1, fid_state.m2, fid_state.s2)
        print0(f"FID: {fid}")


if __name__ == "__main__":
    main()
