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

    import jax
    import numpy as np

    from dxmi_tpu.data.cifar10 import CIFAR10
    from dxmi_tpu.fid import runner as fid_runner
    from dxmi_tpu.fid import stats as S
    from dxmi_tpu.fid.inception import InceptionV3FID, load_fid_inception_params

    weights = args.weights or fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
    if weights is None:
        raise SystemExit("FID Inception weights not found")

    model = InceptionV3FID()
    params = load_fid_inception_params(weights)
    extract = jax.jit(lambda x: model.apply({"params": params}, x))

    ds = CIFAR10(args.data_dir, train=True)
    acts = []
    for i in range(0, len(ds), args.batch):
        x = ds.images[i:i + args.batch].astype(np.float32) / 255.0
        acts.append(np.asarray(extract(x)))
        if (i // args.batch) % 50 == 0:
            print(f"{i}/{len(ds)}")
    mu, sigma = S.activation_statistics(np.concatenate(acts))
    np.savez(args.out, mu=mu, sigma=sigma, m2=mu, s2=sigma)
    print(f"saved stats to {args.out}")


if __name__ == "__main__":
    main()
