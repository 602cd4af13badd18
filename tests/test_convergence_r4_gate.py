"""Round-4 convergence gate assertions over the COMMITTED chip-run
artifacts (CONVERGENCE.md §5/§6; VERDICT r3 weak #5's 'gate-fires
assertion').

Inputs: docs/conv_r4_refenv_chip.log + docs/conv_r4_literal_chip.log
(full stdout of the two on-chip 2,500-step runs) and
docs/conv_r4_best_meta.json (the ``sampler_best.msgpack`` metas the
best-FID gate wrote, extracted because results/ run dirs are
gitignored)."""
import json
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def _curve(log_name):
    path = os.path.join(DOCS, log_name)
    if not os.path.exists(path):
        pytest.skip(f"{log_name} not committed")
    fids = [float(m.group(1)) for m in
            re.finditer(r"^FID: ([0-9.]+)", open(path).read(), re.M)]
    assert len(fids) == 10  # evals at iters 0, 250, ..., 2250
    return {250 * i: f for i, f in enumerate(fids)}


@pytest.fixture(scope="module")
def metas():
    path = os.path.join(DOCS, "conv_r4_best_meta.json")
    if not os.path.exists(path):
        pytest.skip("meta json not committed")
    return json.load(open(path))


def test_refenv_gate_fired_at_curve_minimum(metas):
    curve = _curve("conv_r4_refenv_chip.log")
    best_iter = min(curve, key=curve.get)
    m = metas["conv_r4_refenv"]
    assert m["iter"] == best_iter == 1250
    assert abs(m["fid"] - curve[best_iter]) < 1e-3


def test_literal_envelope_no_late_regression(metas):
    """At the reference's literal lr envelope the curve is monotone-ish
    down with its global minimum in the LATE window — the opposite of
    the compressed-lr runs' late regression (CONVERGENCE.md §6)."""
    curve = _curve("conv_r4_literal_chip.log")
    m = metas["conv_r4_literal"]
    best_iter = min(curve, key=curve.get)
    assert m["iter"] == best_iter == 2250  # gate fired at the minimum
    assert abs(m["fid"] - curve[best_iter]) < 1e-3
    early_min = min(v for k, v in curve.items() if k < 1250)
    late_min = min(v for k, v in curve.items() if k >= 1250)
    assert late_min < 0.5 * early_min  # still improving late
    assert curve[2250] < curve[0] / 100  # 14.57 -> 0.043