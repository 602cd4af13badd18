"""Produce the golden trajectory replay for a trained NATIVE DDGAN run
dir (VERDICT r4 Missing #2): deterministic `sample` replay — fixed key,
recorded per-step states — saved as golden.npz beside the checkpoints.

The reference snapshot ships no DDGAN module (SURVEY.md §2.0), so the
native trainer's output IS the oracle; the golden file freezes it so
tests/test_golden_ddgan_fixture.py can detect any future regression in
the NCSN++ forward, the VP posterior math, or the trained-weight
loading.

    python scripts/make_ddgan_golden.py --log_dir <run_dir> [--sampler best]
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
    p.add_argument("--log_dir", required=True)
    p.add_argument("--sampler", default="best", choices=["best", "last"])
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from dxmi_tpu import config as cfglib
    from dxmi_tpu.config import instantiate
    from dxmi_tpu.utils import checkpoint as ckptlib

    cfg = cfglib.load_yaml(os.path.join(args.log_dir, "config.yaml"))
    net = instantiate(cfg["sampler_net"])
    sampler = instantiate(cfg["sampler"], net=net)
    params = sampler.init_params(jax.random.key(0))
    ckpt = os.path.join(args.log_dir, f"sampler_{args.sampler}.msgpack")
    params = ckptlib.load_sampler_params(ckpt, current=params)

    key = jax.random.key(args.seed)
    d = jax.jit(lambda p, k: sampler.sample(p, k, args.n))(params, key)
    d = {k: np.asarray(v) for k, v in d.items()}
    out = os.path.join(args.log_dir, "golden.npz")
    np.savez(out, seed=args.seed, n=args.n,
             sample=d["sample"],
             log_betas=np.asarray(params["log_betas"]),
             **{f"d_{k}": v for k, v in d.items() if k != "sample"})
    print(f"golden replay ({args.n} samples, seed {args.seed}) -> {out}")
    print("sample stats:", d["sample"].mean(), d["sample"].std())


if __name__ == "__main__":
    main()
