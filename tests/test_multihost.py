"""Multi-host (multi-process) execution of the SPMD training path.

The reference's DEFAULT mode is torchrun multi-process DDP
(/root/reference/train_cifar10.py:298-324); dxmi_tpu's equivalent is
``jax.distributed`` + ``global_batch`` / ``sync_hosts``
(dxmi_tpu/parallel/mesh.py:57-97). This test actually exercises
``process_count > 1``: two local CPU processes x 4 devices each run one
full DxMI step on an 8-device global mesh, assembling the batch with
``jax.make_array_from_process_local_data`` — and must match the
single-process 8-device oracle.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    env = dict(os.environ, DXMI_PLATFORM="cpu", OMP_NUM_THREADS="1")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_prog.py"),
             str(i), "2", str(port), outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        f"proc0:\n{logs[0][-3000:]}\nproc1:\n{logs[1][-3000:]}")
    with open(outs[0]) as fh:
        multi = json.load(fh)

    # single-process oracle on the in-process 8-device mesh
    from tests import multihost_prog

    metrics, checksum = multihost_prog.run_step()
    for k, v in metrics.items():
        assert multi["metrics"][k] == pytest.approx(v, rel=1e-4, abs=1e-5), k
    assert multi["checksum"] == pytest.approx(checksum, rel=1e-5)


@pytest.mark.heavy
def test_two_process_generation_fid_matches_single_process(tmp_path):
    """Sharded generation + sharded FID statistics across 2 processes
    (the reference's per-rank generate -> all_gather stats flow,
    /root/reference/train_image_large.py:39-88) must reproduce the
    single-process FID."""
    port = _free_port()
    outs = [str(tmp_path / f"fid{i}.json") for i in range(2)]
    env = dict(os.environ, DXMI_PLATFORM="cpu", OMP_NUM_THREADS="1")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_prog.py"),
             str(i), "2", str(port), outs[i], "fid"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        f"proc0:\n{logs[0][-3000:]}\nproc1:\n{logs[1][-3000:]}")
    with open(outs[0]) as fh:
        multi = json.load(fh)

    from tests import multihost_prog

    single = multihost_prog.run_fid()
    for k, v in single.items():
        assert multi["metrics"][k] == pytest.approx(v, rel=1e-4, abs=1e-6), k
