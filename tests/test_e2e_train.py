"""End-to-end entry-point smokes (subprocess, tiny models, fake data).

Marked slow: several minutes of XLA CPU compile each.
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

ENV = dict(os.environ, DXMI_PLATFORM="cpu", OMP_NUM_THREADS="1",
           XLA_FLAGS="--xla_force_host_platform_device_count=1")


def run(args, timeout=1500):
    return subprocess.run([sys.executable, "-u"] + args, cwd=str(REPO),
                          env=ENV, capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_train_cifar10_smoke(tmp_path):
    r = run(["train_cifar10.py", "--config", "configs/cifar10/T10.yaml",
             "--dataset", "configs/cifar10/cifar10.yaml",
             "--run", "pytest_smoke", "--fake_data", "--max_steps", "2",
             "--sampler_net.ch", "32", "--sampler_net.ch_mult", "[1,2]",
             "--sampler_net.num_res_blocks", "1",
             "--sampler_net.attn_resolutions", "[8]",
             "--value.net.nh", "16",
             "--training.batchsize", "8", "--training.n_epochs", "1",
             "--training.fid_epoch", "None", "--training.log_every", "1",
             "--training.sampler_ckpt", "None"])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "done: 2 iters" in r.stdout
    logdir = REPO / "results/cifar10/T10/pytest_smoke"
    assert (logdir / "config.yaml").exists()
    assert (logdir / "sampler_last.msgpack").exists()


@pytest.mark.slow
def test_train_2d_smoke():
    r = run(["train_2d.py", "--data", "8gaussians", "--n_iter", "30",
             "--pretrain_iters", "50", "--batchsize", "32",
             "--out", "/tmp/dxmi_2d_pytest"])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "mean log-likelihood" in r.stdout
