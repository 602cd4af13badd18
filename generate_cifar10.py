"""Generate samples from a trained DxMI CIFAR-10 run (+ optional
value-guided sampling and FID scoring).

Mirrors the reference CLI (/root/reference/generate_cifar10.py): reads
``config.yaml`` + ``sampler_{best|last}`` from the run directory — the run
dir is the serialized experiment contract.

    python generate_cifar10.py --log_dir results/cifar10/T10/myrun \
        [--sampler best|last] [--n_generate 50000] [--batchsize 100] \
        [--guidance_scale 0.1] [--save_dir out] [--eval_fid]

TPU-native: generation runs as jitted scans in sampling_batchsize chunks;
PNG writing streams on a background thread so the device never waits on
host I/O.
"""
from __future__ import annotations

import argparse
import os
import queue
import threading

import jax

from dxmi_tpu.runtime import init_runtime

init_runtime()  # DXMI_PLATFORM override + persistent compile cache

import jax.numpy as jnp
import numpy as np

from dxmi_tpu import config as cfglib
from dxmi_tpu.config import instantiate
from dxmi_tpu.utils import checkpoint as ckptlib


def print0(*a, **k):
    if jax.process_index() == 0:
        print(*a, **k, flush=True)


class AsyncPNGWriter:
    """Background PNG writer: device keeps sampling while the host encodes
    (replaces the reference's inline save_image loop,
    generate_cifar10.py:195-209, which is host-I/O bound).

    Prefers the native threaded encoder (csrc/dxmi_io.cpp via
    dxmi_tpu.utils.native_io); falls back to a Python thread pool + PIL."""

    def __init__(self, out_dir: str, prefix: str, n_threads: int = 4):
        from dxmi_tpu.utils import native_io

        self.out_dir = out_dir
        self.prefix = prefix
        self.native = native_io.available()
        self._native_io = native_io
        if not self.native:
            from PIL import Image  # noqa: F401

            self.q: "queue.Queue" = queue.Queue(maxsize=64)
            self.threads = [threading.Thread(target=self._work, daemon=True)
                            for _ in range(n_threads)]
            for t in self.threads:
                t.start()

    def _work(self):
        from PIL import Image

        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            idx, arr = item
            Image.fromarray(arr).save(
                os.path.join(self.out_dir, f"{self.prefix}_{idx}.png"))
            self.q.task_done()

    def put_batch(self, start_idx: int, batch_u8: np.ndarray):
        for j, img in enumerate(batch_u8):
            path = os.path.join(self.out_dir, f"{self.prefix}_{start_idx + j}.png")
            if self.native:
                self._native_io.write_png_async(path, img)
            else:
                self.q.put((start_idx + j, img))

    def close(self):
        if self.native:
            errs = self._native_io.flush()
            if errs:
                raise IOError(f"{errs} PNG writes failed")
            return
        for _ in self.threads:
            self.q.put(None)
        self.q.join()


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8."""
    x = np.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--sampler", "--epoch", dest="sampler", default="best",
                   choices=["best", "last"],
                   help="which checkpoint to load (the reference calls "
                        "this flag --epoch, generate_cifar10.py:69-73)")
    p.add_argument("-n", "--n_generate", type=int, default=50000)
    p.add_argument("--batchsize", type=int, default=100)
    p.add_argument("--stat", default=None,
                   help="FID dataset-stats file (.pt/.npz); defaults to the "
                        "reference's datasets/cifar10_train_fid_stats.pt "
                        "lookup (generate_cifar10.py:214-228 --stat flag)")
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_fid", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 static-calibrated sampling (+30%% throughput "
                        "on the CIFAR net, ~4.5%% sample drift — PERF.md)")
    p.add_argument("--dtype", default=None, choices=["fp32", "bf16"],
                   help="sampler-net compute dtype (params stay fp32). "
                        "Default: bf16 for NCSN++/DDGAN run dirs — gated "
                        "on the trained fixture (Frechet 400x below the "
                        "fp32 seed floor, pixel drift 0.33%% — PERF.md "
                        "r5 DDGAN gate table); fp32 otherwise.")
    p.add_argument("--cleanup", action="store_true",
                   help="delete generated PNGs after FID")
    p.add_argument("--save_npz", default=None,
                   help="also stream samples into an evaluator npz "
                        "(skips the make_npz.py step)")
    p.add_argument("-save", "--save_images", default=None,
                   help="reference flag (generate_cifar10.py:75-80): "
                        "False deletes the PNGs after FID (== --cleanup)")
    args, unknown = p.parse_known_args()
    if str(args.save_images).lower() in ("false", "0", "no"):
        args.cleanup = True

    cfg = cfglib.load_yaml(os.path.join(args.log_dir, "config.yaml"))
    d_cmd = cfglib.parse_nested_args(cfglib.parse_unknown_args(unknown))
    cfg = cfglib.merge(cfg, d_cmd)

    assert args.n_generate % args.batchsize == 0, \
        "n_generate must be a multiple of batchsize"

    target = str(cfg["sampler_net"].get("_target_", "")).lower()
    net_kw = {}
    if args.dtype == "bf16" or (args.dtype is None and "ncsnpp" in target):
        # bf16 torso default for the DDGAN family: trained-fixture gated
        # (bf16 Frechet 0.0002 vs fp32 seed floor 0.0898, pixel drift
        # 0.33%; bf16+int8 skip_attn 0.0084 — PERF.md r5 DDGAN gate
        # table, scripts/bench_ddgan_quality.py)
        net_kw["dtype"] = jnp.bfloat16
        print0("bf16 compute torso (params fp32; --dtype fp32 opts out)")
    if args.int8:
        if "ncsnpp" in target:
            # the gated DDGAN headline stack keeps the attention 1x1s
            # out of int8 (faster AND lower drift than full int8 —
            # PERF.md r4 DDGAN sweep + r5 gate table)
            net_kw["quant_skip_attn"] = True
        try:
            net = instantiate(cfg["sampler_net"], quant_int8="static",
                              **net_kw)
        except TypeError:
            raise SystemExit(
                f"--int8: sampler_net {cfg['sampler_net'].get('_target_')} "
                "has no int8 mode (supported: UNetSmall, UNetADM, NCSNpp)")
    else:
        net = instantiate(cfg["sampler_net"], **net_kw)
    sampler = instantiate(cfg["sampler"], net=net)

    torch_kind = "unet_small" if "unet_small" in target else None
    ckpt, ckpt_path = ckptlib.load_run_checkpoint(
        args.log_dir, "sampler", args.sampler, torch_kind=torch_kind)
    sampler_params = jax.tree.map(jnp.asarray, ckpt["params"])
    if "log_betas" not in sampler_params:  # base (pre-DxMI) torch ckpt
        sampler_params = {**sampler.init_params(jax.random.key(0)),
                          **sampler_params}
    print0(f"sampler loaded from {ckpt_path}")
    meta = ckpt.get("meta", {})
    if "fid" in meta:
        print0(f"checkpoint FID {meta['fid']} (epoch {meta.get('epoch')})")

    if args.int8:
        if not hasattr(sampler, "calibrate_quant"):
            raise SystemExit("--int8 requires a sampler with calibrate_quant")
        sampler_params = sampler.calibrate_quant(
            sampler_params, jax.random.key(args.seed + 123))
        print0("int8: static activation scales calibrated")

    trainer = None
    state = None
    if args.guidance_scale:
        value = instantiate(cfg["value"])
        trainer = instantiate(cfg["trainer"],
                              batchsize=args.batchsize,
                              n_timesteps=cfg["sampler"]["n_timesteps"])
        trainer.set_models(sampler, value, lr=1e-7, v_lr=1e-5)
        v_ckpt, v_path = ckptlib.load_run_checkpoint(
            args.log_dir, "value", args.sampler, torch_kind="value")
        print0(f"value loaded from {v_path}")
        v_params = jax.tree.map(jnp.asarray, v_ckpt["params"])
        v_stats = (jax.tree.map(jnp.asarray, v_ckpt["sn_stats"])
                   if "sn_stats" in v_ckpt else None)
        state = trainer.init_state(sampler_params, v_params, v_stats=v_stats)
        trainer.guidance_scale = args.guidance_scale
        print0(f"value-guided sampling, scale={args.guidance_scale}")

    save_dir = args.save_dir or os.path.join(
        args.log_dir, f"generated_{args.sampler}")
    os.makedirs(save_dir, exist_ok=True)
    writer = AsyncPNGWriter(save_dir, prefix=str(jax.process_index()))

    # SPMD generation: shard the sample batch over this process's LOCAL
    # devices (the reference spreads generation with one DDP process per
    # GPU, generate_cifar10.py:172-180). The loop is per-host independent
    # (per-process keys + shards), so the mesh must be local, not global.
    from dxmi_tpu.parallel import create_mesh, data_sharding

    mesh = create_mesh(devices=jax.local_devices())
    out_sh = None
    if mesh.devices.size > 1 and args.batchsize % mesh.devices.size == 0:
        out_sh = data_sharding(mesh)

    if trainer is not None:
        sample_fn = jax.jit(lambda k: trainer.sample_guidance(
            state, k, args.batchsize,
            guidance_scale=args.guidance_scale)["sample"],
            out_shardings=out_sh)
    else:
        sample_fn = jax.jit(
            lambda k: sampler.sample(sampler_params, k, args.batchsize)["sample"],
            out_shardings=out_sh)

    key = jax.random.key(args.seed)
    key = jax.random.fold_in(key, jax.process_index())
    n_local = args.n_generate // jax.process_count()
    i_img = 0
    n_batches = n_local // args.batchsize
    npz_writer = None
    if args.save_npz and jax.process_index() == 0:
        from dxmi_tpu.utils.npz_stream import NpzStreamWriter

        h, w_, c = sampler.sample_shape
        npz_writer = NpzStreamWriter(args.save_npz,
                                     n_total=n_batches * args.batchsize,
                                     shape_tail=(h, w_, c))
    for i in range(n_batches):
        key, k = jax.random.split(key)
        x = np.asarray(sample_fn(k))
        xu8 = to_uint8(x)
        writer.put_batch(i_img, xu8)
        if npz_writer is not None:
            npz_writer.write(xu8)
        i_img += len(x)
        if (i + 1) % 10 == 0:
            print0(f"{i_img}/{n_local} generated")
    writer.close()
    if npz_writer is not None:
        npz_writer.close()
        print0(f"saved npz to {args.save_npz}")
    print0(f"wrote {i_img} PNGs to {save_dir}")

    # all hosts must finish writing before rank 0 reads the shared PNG dir
    # (the reference's torch.distributed.barrier, generate_cifar10.py:211)
    from dxmi_tpu.parallel import sync_hosts

    sync_hosts("generate_pngs")

    if (args.eval_fid or args.stat) and jax.process_index() == 0:
        from dxmi_tpu.fid import runner as fid_runner

        w = fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
        s = args.stat or fid_runner._find(fid_runner.DEFAULT_STATS)
        if w is None or s is None:
            print0("FID skipped: Inception weights / dataset stats not on disk")
        else:
            from dxmi_tpu.fid import stats as stats_lib
            from dxmi_tpu.fid.image_dir import dir_activations

            fid_state = fid_runner.build_fid_state(w, s)
            acts = dir_activations(save_dir, fid_state.extract_fn,
                                   batch=args.batchsize)
            m1, s1 = stats_lib.activation_statistics(acts)
            fid = stats_lib.frechet_distance(m1, s1, fid_state.m2, fid_state.s2)
            print0(f"FID: {fid}")
        if args.cleanup:
            import shutil

            shutil.rmtree(save_dir)


if __name__ == "__main__":
    main()
