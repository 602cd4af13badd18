"""End-to-end training-convergence test (VERDICT r2 missing #1).

Runs the full train_2d.py entry from a deliberately weak pretrain and
asserts the true-pdf likelihood RISES by a margin — the first test that
proves DxMI training improves a model rather than merely matching the
reference step-for-step. Reference behavior being claimed: the training
loop drives sample quality up over epochs
(/root/reference/train_cifar10.py:386-442; 2D analogue with exact
likelihood). Curve fixtures + the torch-reference A/B:
CONVERGENCE.md, tests/fixtures/convergence_2d/.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_dxmi_2d_likelihood_rises(tmp_path):
    curve_out = str(tmp_path / "curve.json")
    env = dict(os.environ, DXMI_PLATFORM="cpu", OMP_NUM_THREADS="1")
    cmd = [sys.executable, os.path.join(REPO, "train_2d.py"),
           "--data", "8gaussians", "--pretrain_iters", "300",
           "--n_iter", "2000", "--lr", "3e-5", "--v_lr", "3e-4",
           "--beta_lr", "1e-5", "--tau1", "0.0", "--tau2", "0.01",
           "--eval_every", "250", "--eval_n", "2000",
           "--curve_out", curve_out, "--out", str(tmp_path / "2d"),
           "--seed", "0"]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=1500)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    with open(curve_out) as fh:
        curve = json.load(fh)["curve"]

    initial = curve[0]["loglik"]
    best = max(p["loglik"] for p in curve[1:])
    final = curve[-1]["loglik"]
    # measured: -5.04 -> best ~-3.9 by iter 2000 (CONVERGENCE.md §1);
    # a 0.5-nat rise is far outside eval noise (~0.05 at n=2000)
    assert best > initial + 0.5, (initial, best, curve)
    # and training must END better than it started, not just spike
    assert final > initial + 0.3, (initial, final, curve)