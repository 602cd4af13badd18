"""Precompute CIFAR-10 train FID statistics (the reference's
``datasets/cifar10_train_fid_stats.pt`` cache, train_cifar10.py:360-364).

    python scripts/make_cifar_fid_stats.py \
        --data_dir datasets --out datasets/cifar10_train_fid_stats.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="datasets")
    p.add_argument("--out", default="datasets/cifar10_train_fid_stats.npz")
    p.add_argument("--weights", default=None)
    p.add_argument("--batch", type=int, default=100)
    args = p.parse_args()

    import jax  # noqa: F401  (backend init before the runner import)

    from dxmi_tpu.fid import runner as fid_runner

    weights = args.weights or fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
    if weights is None:
        raise SystemExit("FID Inception weights not found")
    out = fid_runner.build_cifar_train_stats(
        weights, data_dir=args.data_dir, out_path=args.out, batch=args.batch)
    if out is None:
        raise SystemExit(f"CIFAR batches not found under {args.data_dir}")
    print(f"saved stats to {out}")


if __name__ == "__main__":
    main()
