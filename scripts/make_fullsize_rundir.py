"""Build a full-size CIFAR-10 run dir (randomly initialized sampler) for
large-scale generation rehearsal.

The reference's production workflow is: published run dir ->
generate_cifar10.py -n 50000 -> FID npz/PNGs (reference README.md:160-176).
The container has no published full-size weights, so this materializes the
run-dir contract (config.yaml + sampler_best.msgpack) at the REAL model
size from configs/cifar10/T10.yaml; generation rehearsal then exercises
the true 50k compute + IO envelope end-to-end.

Usage: python scripts/make_fullsize_rundir.py <out_dir>
"""
import os
import sys

if len(sys.argv) < 2:
    sys.exit("usage: python scripts/make_fullsize_rundir.py <out_dir>")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax

if os.environ.get("DXMI_PLATFORM"):   # e.g. cpu — don't claim the chip
    jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])

from dxmi_tpu import config as cfglib
from dxmi_tpu.config import instantiate
from dxmi_tpu.utils.checkpoint import save_run_checkpoint


def main():
    out = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # optional config override: any of the shipped experiment configs
    # (e.g. configs/lsun/T10.yaml for the 526M 256^2 rehearsal)
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else "configs/cifar10/T10.yaml"
    parts = [cfglib.load_yaml(os.path.join(repo, cfg_path))]
    if "cifar10" in cfg_path:
        parts.append(cfglib.load_yaml(
            os.path.join(repo, "configs/cifar10/cifar10.yaml")))
    cfg = cfglib.merge(*parts)
    if "diffusion" in cfg:  # EDM/ADM-family config (image_large entries)
        sys.path.insert(0, repo)
        from train_image_large import build_sampler

        sampler, params = build_sampler(cfg, jax.random.key(0))
        os.makedirs(out, exist_ok=True)
        cfglib.save_yaml(cfg, os.path.join(out, "config.yaml"))
        save_run_checkpoint(out, "best", sampler_params=params,
                            meta={"fid": float("inf"), "i_iter": 0,
                                  "note": "random init, rehearsal only"})
        print(f"run dir ready: {out}")
        return
    net = instantiate(cfg["sampler_net"])
    sampler = instantiate(cfg["sampler"], net=net)
    params = sampler.init_params(jax.random.key(0))
    os.makedirs(out, exist_ok=True)
    cfglib.save_yaml(cfg, os.path.join(out, "config.yaml"))
    save_run_checkpoint(out, "best", sampler_params=params,
                        meta={"fid": float("inf"), "i_iter": 0,
                              "note": "random init, rehearsal only"})
    print(f"run dir ready: {out}")


if __name__ == "__main__":
    main()
