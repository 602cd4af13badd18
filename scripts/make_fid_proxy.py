"""Materialize a PROXY FID setup when the published Inception weights are
absent (zero-egress container): synthetic pt-layout Inception weights +
dataset statistics over the fake-CIFAR stand-in, at the default paths
train_cifar10's FID hook looks for (fid/runner.py DEFAULT_*).

The resulting FID numbers are RELATIVE-ONLY (fixed random features);
they are still a valid convergence signal — the extractor is a fixed
structured conv net, and the statistics target is the training data
itself — and they exercise the exact production code path: un-mocked
BN-fold weight loading (tests/test_inception_load.py cross-checks this
loader against a torch oracle), stats caching, best-FID gating.

Usage: DXMI_PLATFORM=cpu python scripts/make_fid_proxy.py [--batch 128]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401
from _bench_common import REPO

import jax

if os.environ.get("DXMI_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128,
                   help="training batchsize (sets the minimum fake-data size)")
    p.add_argument("--n", type=int, default=4096,
                   help="stats-set size (same synthetic distribution as "
                        "the --fake_data trainer)")
    p.add_argument("--seed", type=int, default=112233)
    p.add_argument("--extract_batch", type=int, default=64)
    p.add_argument("--virtual_name", default=None,
                   help="ALSO write datasets/VIRTUAL_<name>.npz with "
                        "stats over the structured CLASS data "
                        "(data/synthetic.structured_class_images) — the "
                        "train_image_large FID-gate naming "
                        "(maybe_fid_state); use with --image_size/"
                        "--n_class for the Cond convergence recipe")
    p.add_argument("--image_size", type=int, default=16)
    p.add_argument("--n_class", type=int, default=4)
    p.add_argument("--data_seed", type=int, default=42,
                   help="seed of the structured pool (= the training "
                        "seed so stats target the training data)")
    args = p.parse_args()

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _inception_oracle import make_synthetic_state_dict

    from dxmi_tpu.data.cifar10 import fake_cifar
    from dxmi_tpu.fid import stats as stats_lib
    from dxmi_tpu.fid.inception import InceptionV3FID, load_fid_inception_params

    os.makedirs(os.path.join(REPO, "datasets"), exist_ok=True)
    wpath = os.path.join(REPO, "datasets", "pt_inception-2015-12-05.npz")
    if not os.path.exists(wpath):
        np.savez(wpath, **make_synthetic_state_dict(seed=0, numpy=True))
        print(f"synthetic Inception weights -> {wpath}")

    # stats over the SAME synthetic distribution train_cifar10 --fake_data
    # draws from (fake_cifar structured generator, same seed)
    ds = fake_cifar(max(args.n, args.batch * 4, 256), args.seed)
    model = InceptionV3FID()
    params = load_fid_inception_params(wpath)
    extract = jax.jit(lambda x: model.apply({"params": params}, x))
    acts = []
    for i in range(0, len(ds), args.extract_batch):
        x = ds.images[i:i + args.extract_batch].astype(np.float32) / 255.0
        acts.append(np.asarray(extract(x)))
    mu, sigma = stats_lib.activation_statistics(np.concatenate(acts))
    spath = os.path.join(REPO, "datasets", "cifar10_train_fid_stats.npz")
    np.savez(spath, mu=mu, sigma=sigma, m2=mu, s2=sigma)
    print(f"fake-data FID stats ({len(ds.images)} images) -> {spath}")

    if args.virtual_name:
        from dxmi_tpu.data.synthetic import structured_class_images

        imgs, _ = structured_class_images(args.n, args.image_size,
                                          args.n_class, seed=args.data_seed)
        acts = []
        for i in range(0, len(imgs), args.extract_batch):
            x = (imgs[i:i + args.extract_batch] + 1.0) / 2.0  # [0,1]
            acts.append(np.asarray(extract(x.astype(np.float32))))
        mu, sigma = stats_lib.activation_statistics(np.concatenate(acts))
        vpath = os.path.join(REPO, "datasets",
                             f"VIRTUAL_{args.virtual_name}.npz")
        np.savez(vpath, mu=mu, sigma=sigma, m2=mu, s2=sigma)
        print(f"structured class-data stats ({len(imgs)}) -> {vpath}")


if __name__ == "__main__":
    main()
