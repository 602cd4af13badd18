"""Round-5 convergence gate assertions over the COMMITTED chip-run
artifacts (VERDICT r4 tasks 3/4/6).

Same pattern as tests/test_convergence_r4_gate.py: each run's full
stdout is committed under docs/ and the ``sampler_best.msgpack`` metas
are extracted into docs/conv_r5_best_meta.json (results/ run dirs are
gitignored).  Runs:

  ddgan_r5_fixture  — 1,500 DxMI steps over the 800-step-pretrained
                      NCSN++ (scripts/run_ddgan_fixture.sh); the
                      trained-DDGAN fixture's provenance.
  conv_r5_cond      — 2,500 DxMITrainerCond steps over an
                      under-pretrained class-cond ADM
                      (scripts/run_convergence_cond.sh) — the Cond
                      family's first multi-step convergence curve.
                      Reference loop: train_image_large.py:248-269.
  conv_r5_fastlevers— the conv_r4_refenv recipe under --fast_levers
                      (scripts/run_convergence_fastlevers.sh); curve
                      must match the parity config's class
                      (CONVERGENCE.md §5).
"""
import json
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def _curve(log_name, every=250):
    """Parse either FID-line format: train_cifar10 prints ``FID: x``
    at the fid_every cadence; train_image_large prints
    ``iter N FID x``."""
    path = os.path.join(DOCS, log_name)
    if not os.path.exists(path):
        pytest.skip(f"{log_name} not committed")
    text = open(path).read()
    tagged = re.findall(r"^iter (\d+) FID ([0-9.]+)", text, re.M)
    if tagged:
        return {int(i): float(f) for i, f in tagged}
    fids = [float(m.group(1)) for m in
            re.finditer(r"^FID: ([0-9.]+)", text, re.M)]
    return {every * i: f for i, f in enumerate(fids)}


def _iter(meta):
    return meta.get("iter", meta.get("i_iter"))


@pytest.fixture(scope="module")
def metas():
    path = os.path.join(DOCS, "conv_r5_best_meta.json")
    if not os.path.exists(path):
        pytest.skip("meta json not committed")
    return json.load(open(path))


def test_ddgan_fixture_gate_fired_below_pretrain_start(metas):
    """The DDGAN run's best-FID gate fired at the curve minimum, and the
    minimum BEATS the pretrained starting point (0.82 -> 0.0798 at iter
    1000) — DxMI improved the 800-step-pretrained NCSN++, through the
    adversarial transient (0.82 -> 2.52 peak -> 0.0798)."""
    curve = _curve("ddgan_r5_fixture_chip.log")
    assert len(curve) == 6  # evals at 0, 250, ..., 1250
    m = metas["ddgan_r5_fixture"]
    best_iter = min(curve, key=curve.get)
    assert m["iter"] == best_iter == 1000
    assert abs(m["fid"] - curve[best_iter]) < 1e-3
    assert curve[best_iter] < 0.2 * curve[0]  # 10x better than start


def test_cond_gate_fired_and_improved(metas):
    """The Cond-family run (DxMITrainerCond + EDMSampler + class-cond
    UNetADM) improves the under-pretrained sampler with the best gate
    firing at the curve minimum — the last trainer family's multi-step
    convergence evidence (VERDICT r4 Missing #1)."""
    curve = _curve("conv_r5_cond_chip.log")
    assert len(curve) == 10  # evals at 0, 250, ..., 2250
    m = metas["conv_r5_cond"]
    best_iter = min(curve, key=curve.get)
    assert _iter(m) == best_iter == 250
    assert abs(m["fid"] - curve[best_iter]) < 1e-3
    assert curve[best_iter] < 0.5 * curve[0]  # materially improved


def test_fastlevers_matches_parity_curve_class(metas):
    """--fast_levers (bf16 sampler+value torso + bf16_onepass GN in the
    backward) reproduces the conv_r4_refenv curve CLASS: improvement
    from the same start, best-gate at a mid-curve minimum, same
    better-than-start endpoint behavior."""
    curve = _curve("conv_r5_fastlevers_chip.log")
    m = metas["conv_r5_fastlevers"]
    best_iter = min(curve, key=curve.get)
    assert _iter(m) == best_iter
    assert abs(m["fid"] - curve[best_iter]) < 1e-3
    # same evidence class as the r4 refenv run: a deep mid-curve
    # minimum well below the starting FID
    assert 0 < best_iter < 2500
    assert curve[best_iter] < 0.5 * curve[0]
