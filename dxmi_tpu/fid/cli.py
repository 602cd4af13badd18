"""Standalone FID CLI (parity with pytorch_fid's ``main()``,
/root/reference/pytorch_fid/fid_score.py:433-449):

    python -m dxmi_tpu.fid.cli path1 path2 [--batch-size 50]
    python -m dxmi_tpu.fid.cli --save-stats path out_stats.npz

Paths may be image directories or .npz stats files (mu/sigma or m2/s2).
"""
from __future__ import annotations

import argparse
import os


def _stats_for(path, extract_fn, batch):
    import numpy as np

    from dxmi_tpu.fid import stats as S
    from dxmi_tpu.fid.image_dir import compute_dir_statistics
    from dxmi_tpu.fid.runner import load_dataset_stats

    if path.endswith((".npz", ".pt")):
        return load_dataset_stats(path)
    return compute_dir_statistics(path, extract_fn, batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--weights", default=None)
    p.add_argument("--save-stats", action="store_true",
                   help="paths = [image_dir, out.npz]: precompute stats")
    args = p.parse_args()

    from dxmi_tpu.fid import runner as fid_runner
    from dxmi_tpu.fid import stats as S
    from dxmi_tpu.fid.image_dir import compute_dir_statistics, save_stats

    weights = args.weights or fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
    if weights is None:
        raise SystemExit("FID Inception weights not found on disk")

    import jax

    from dxmi_tpu.fid.inception import InceptionV3FID, load_fid_inception_params

    model = InceptionV3FID()
    params = load_fid_inception_params(weights)
    extract = jax.jit(lambda x: model.apply({"params": params}, x))

    if args.save_stats:
        src, dst = args.paths
        mu, sigma = compute_dir_statistics(src, extract, args.batch_size)
        save_stats(dst, mu, sigma)
        print(f"stats saved to {dst}")
        return

    (m1, s1), (m2, s2) = (_stats_for(p_, extract, args.batch_size)
                          for p_ in args.paths)
    print("FID:", S.frechet_distance(m1, s1, m2, s2))


if __name__ == "__main__":
    main()
