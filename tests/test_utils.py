"""Tests for config, data, logging, checkpoint, metrics, and RNG utils."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu import config as C
from dxmi_tpu import rng as R
from dxmi_tpu.data import synthetic
from dxmi_tpu.data.cifar10 import EpochLoader, fake_cifar
from dxmi_tpu.utils import checkpoint as ckpt
from dxmi_tpu.utils import metrics as M
from dxmi_tpu.utils.logging import expand_metrics, make_grid


def test_cli_parsing():
    d = C.parse_unknown_args(["--training.lr", "1e-6", "--a.b.c", "5",
                              "--flag", "True", "--name", "x",
                              "--lst", "[1,2]", "--none", "None"])
    n = C.parse_nested_args(d)
    assert n["training"]["lr"] == 1e-6
    assert n["a"]["b"]["c"] == 5
    assert n["flag"] is True
    assert n["name"] == "x"
    assert n["lst"] == [1, 2]
    assert n["none"] is None


def test_config_merge_and_yaml(tmp_path):
    a = C.Config.from_dict({"x": {"y": 1, "z": 2}, "k": 1})
    b = C.Config.from_dict({"x": {"y": 9}})
    m = C.merge(a, b)
    assert m["x"]["y"] == 9 and m["x"]["z"] == 2 and m["k"] == 1
    assert m.x.y == 9  # attribute access
    p = tmp_path / "c.yaml"
    C.save_yaml(m, str(p))
    assert C.load_yaml(str(p))["x"]["y"] == 9


def test_instantiate_with_alias():
    cfg = {"_target_": "models.modules.IGEBMEncoderV2", "nh": 8,
           "keepdim": False}
    obj = C.instantiate(cfg)
    from dxmi_tpu.models.igebm import IGEBMEncoder

    assert isinstance(obj, IGEBMEncoder)
    assert obj.nh == 8


def test_epoch_loader_sharding():
    ds = fake_cifar(64)
    loaders = [EpochLoader(ds, batch_size=8, seed=1, process_index=i,
                           process_count=2) for i in range(2)]
    seen = []
    for ld in loaders:
        for x, y in ld.epoch(0):
            assert x.shape == (8, 32, 32, 3)
            assert x.min() >= 0 and x.max() <= 1
            seen.append(y)
    # two processes x 4 batches each, disjoint shards covering 64 rows
    assert len(seen) == 8


def test_synthetic_2d():
    for name in ("8gaussians", "2spirals", "checkerboard"):
        x = synthetic.sample2d(name, 128, np.random.RandomState(0))
        assert x.shape == (128, 2)
    pdf = synthetic.pdf_8gaussian(
        synthetic.sample2d("8gaussians", 512, np.random.RandomState(1)))
    assert np.all(pdf > 0)
    e = synthetic.energy2d("U2", np.random.RandomState(2).randn(16, 2))
    assert np.isfinite(e).all()


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": {"c": np.ones(4)}}
    path = str(tmp_path / "x.msgpack")
    ckpt.save_checkpoint(path, params, meta={"fid": 3.25, "epoch": 7})
    back = ckpt.load_checkpoint(path)
    np.testing.assert_allclose(back["params"]["a"], params["a"])
    assert back["meta"]["fid"] == 3.25


def test_expand_metrics():
    m = {"ebm/d_loss_": jnp.asarray(1.5),
         "per_step/t": jnp.array([2, 1, 0]),
         "per_step/running_cost": jnp.array([0.1, 0.2, 0.3]),
         "per_step/value": jnp.array([1.0, 2.0, 3.0]),
         "per_step/sigma": jnp.array([0.5, 0.6])}
    d = expand_metrics(m)
    assert d["ebm/d_loss_"] == 1.5
    assert d["running_cost/step_2_"] == pytest.approx(0.1)
    assert d["value/step_0_"] == pytest.approx(3.0)
    assert d["sigma/sigma_1_"] == pytest.approx(0.6)


def test_make_grid():
    imgs = np.zeros((10, 8, 8, 3), np.float32)
    g = make_grid(imgs, nrow=4)
    assert g.shape == (3 * 10 + 2, 4 * 10 + 2, 3)


def test_auroc_aupr():
    scores = np.array([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
    labels = np.array([1, 1, 0, 1, 0, 0])
    try:
        from sklearn import metrics as skm

        assert M.roc_auc(scores, labels) == pytest.approx(
            skm.roc_auc_score(labels, scores))
        assert M.average_precision(scores, labels) == pytest.approx(
            skm.average_precision_score(labels, scores))
    except ImportError:
        assert 0.5 < M.roc_auc(scores, labels) <= 1.0


def test_deterministic_rng_batch_invariance():
    base = jax.random.key(7)
    full = R.deterministic_randn(base, 0, 8, (4,))
    first = R.deterministic_randn(base, 0, 3, (4,))
    rest = R.deterministic_randn(base, 3, 5, (4,))
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([first, rest]), rtol=1e-6)


def test_evaluator_sfid_tap_semantics():
    """The sFID spatial tap must be the first 7 channels of the Mixed_6d
    (TF ``mixed_6``) block's branch1x1 post-BN+ReLU output (reference
    evaluations/evaluator.py:24,599).  Validates the mapping's linchpin:
    InceptionC concatenates [branch1x1, ...] first, so slicing the block
    output's leading channels IS the branch1x1 activation."""
    import flax.linen as nn
    from dxmi_tpu.fid import inception as I
    from evaluations.evaluator import build_extractors

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 17, 17, 640).astype(np.float32))
    block = I.InceptionC(160)
    params = block.init(jax.random.key(0), x)
    out = block.apply(params, x)
    b1 = I.ConvBN(192, (1, 1)).apply(
        {"params": params["params"]["branch1x1"]}, x)
    assert out.shape[-1] == 768
    np.testing.assert_allclose(np.asarray(out[..., :192]), np.asarray(b1),
                               rtol=1e-6, atol=1e-6)

    # end-to-end: spatial feature dimension is 7*17*17 = 2023
    extract = build_extractors(weights_path=None, batch=2)
    feats = extract(np.zeros((2, 32, 32, 3), np.float32))
    assert feats["spatial"].shape == (2, 2023)
    assert feats["pool3"].shape == (2, 2048)


def test_evaluator_prec_recall_sanity():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from evaluations.evaluator import compute_prec_recall, inception_score

    rng = np.random.RandomState(0)
    a = rng.randn(200, 8)
    # identical distributions -> precision/recall near 1
    p, r = compute_prec_recall(a, a + rng.randn(200, 8) * 0.01)
    assert p > 0.9 and r > 0.9
    # disjoint -> near 0
    p2, r2 = compute_prec_recall(a, a + 100.0)
    assert p2 < 0.1 and r2 < 0.1
    # uniform probs -> IS == 1
    probs = np.full((100, 10), 0.1)
    assert inception_score(probs) == pytest.approx(1.0, abs=1e-5)


def test_npz_stream_writer_roundtrip(tmp_path):
    """NpzStreamWriter output loads via np.load AND the evaluator's
    streaming reader; wrong row counts are rejected."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dxmi_tpu.utils.npz_stream import NpzStreamWriter
    from evaluations.evaluator import iter_npz_batches

    imgs = (np.random.RandomState(5).rand(10, 8, 8, 3) * 255).astype(np.uint8)
    p = tmp_path / "stream.npz"
    w = NpzStreamWriter(str(p), n_total=10, shape_tail=(8, 8, 3))
    for i in range(0, 10, 4):
        w.write(imgs[i:i + 4])
    w.close()
    with np.load(p) as d:
        np.testing.assert_array_equal(d["arr_0"], imgs)
    np.testing.assert_array_equal(
        np.concatenate(list(iter_npz_batches(str(p), 3))), imgs)

    w2 = NpzStreamWriter(str(tmp_path / "bad.npz"), n_total=8,
                         shape_tail=(8, 8, 3))
    w2.write(imgs[:4])
    with pytest.raises(ValueError):
        w2.close()


def test_evaluator_npz_streaming(tmp_path):
    """iter_npz_batches streams compressed/uncompressed npz members
    identically to a full read, including a short last chunk."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from evaluations.evaluator import iter_npz_batches, read_npz_images

    imgs = (np.random.RandomState(3).rand(10, 8, 8, 3) * 255).astype(np.uint8)
    for saver, name in ((np.savez, "plain.npz"),
                        (np.savez_compressed, "comp.npz")):
        p = tmp_path / name
        saver(p, arr_0=imgs)
        chunks = list(iter_npz_batches(str(p), 4))
        assert [len(c) for c in chunks] == [4, 4, 2]
        np.testing.assert_array_equal(np.concatenate(chunks), imgs)
        np.testing.assert_array_equal(read_npz_images(str(p)), imgs)


@pytest.mark.slow
def test_evaluator_cli_end_to_end(tmp_path):
    """Full evaluator pipeline with random Inception weights (values not
    meaningful; protocol/plumbing is): FID + sFID + P&R over tiny npz
    batches."""
    import subprocess
    import sys as _sys

    rng = np.random.RandomState(0)
    for name, seed in (("ref.npz", 0), ("sample.npz", 1)):
        imgs = (np.random.RandomState(seed).rand(8, 32, 32, 3) * 255
                ).astype(np.uint8)
        np.savez(tmp_path / name, arr_0=imgs)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, "evaluations/evaluator.py",
         str(tmp_path / "ref.npz"), str(tmp_path / "sample.npz"),
         "--batch", "4"],
        cwd=repo, capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, DXMI_PLATFORM="cpu", OMP_NUM_THREADS="1"))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "FID:" in r.stdout and "sFID:" in r.stdout
    assert "Precision:" in r.stdout and "Recall:" in r.stdout


def test_train_state_save_restore(tmp_path):
    """Full-train-state (params + optimizer states) round trip for
    preemption-safe resume."""
    import flax.linen as nn

    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi import DxMITrainer

    class E(nn.Module):
        @nn.compact
        def __call__(self, x, t, *, deterministic=True):
            return nn.Conv(x.shape[-1], (3, 3), padding=1)(x)

    T, B, RES = 4, 4, 8
    s = VARSampler(E(), n_timesteps=T, sample_shape=(3, RES, RES))
    v = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                     n_timesteps=T, use_sampler_beta=True)
    tr.set_models(s, v, lr=1e-4, v_lr=1e-4)
    sp = s.init_params(jax.random.key(0))
    vp = v.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)

    # run one update so optimizer moments are non-trivial
    d = s.sample(state.sampler_params, jax.random.key(2), B)
    b = buflib.from_d_sample(d)
    state, _ = tr.update_f_v(state, jnp.zeros((B, RES, RES, 3)), b,
                             jax.random.key(3))

    ckpt.save_train_state(str(tmp_path), state, i_iter=17, epoch=3,
                          best_fid=12.5)
    template = tr.init_state(sp, vp)
    restored, meta = ckpt.load_train_state(str(tmp_path), template)
    assert meta == {"i_iter": 17, "epoch": 3, "best_fid": 12.5}
    for a, b_ in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)


def test_profile_kv_accumulates():
    import time as _time
    from dxmi_tpu.utils import kvlogger as kvl

    lg = kvl.get()
    lg.name2val.pop("wait_scope", None)
    with kvl.profile_kv("scope"):
        _time.sleep(0.01)
    with kvl.profile_kv("scope"):
        _time.sleep(0.01)
    # reference semantics: += accumulation, not mean
    assert lg.name2val["wait_scope"] >= 0.02

    @kvl.profile("deco")
    def f(a):
        return a + 1

    assert f(1) == 2
    assert lg.name2val["wait_deco"] >= 0.0
    lg.name2val.clear()
    lg.name2cnt.clear()


def test_batch_run_grad():
    from dxmi_tpu.utils.misc import batch_run_grad

    # fn(x) = 0.5 * ||x_i||^2 per sample -> grad = x_i -> norm = ||x_i||
    def energy(x):
        return 0.5 * jnp.sum(x.reshape(len(x), -1) ** 2, axis=1)

    x = np.random.RandomState(0).randn(10, 4, 4).astype(np.float32)
    g = batch_run_grad(energy, x, batch_size=4)
    expect = np.linalg.norm(x.reshape(10, -1), axis=1)
    assert g.shape == (10,)
    np.testing.assert_allclose(g, expect, rtol=1e-5)


def test_manifold_estimator_device_matches_numpy():
    """The jitted fp32 device path reproduces the numpy float64 oracle
    (radii exactly at k-th order statistic; prec/recall counts equal on
    non-degenerate data), including the padded tail block."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from evaluations.evaluator import ManifoldEstimator, compute_prec_recall

    rng = np.random.RandomState(1)
    a = rng.randn(130, 16).astype(np.float32)
    b = (a[:90] + rng.randn(90, 16).astype(np.float32) * 0.5)

    # row_batch=64 forces multiple blocks + a padded tail (130 = 2*64+2)
    est_d = ManifoldEstimator(3, row_batch=64, device=True)
    est_n = ManifoldEstimator(3, row_batch=64, device=False)
    rd, rn = est_d.manifold_radii(a), est_n.manifold_radii(a)
    np.testing.assert_allclose(rd, rn, rtol=1e-4, atol=1e-5)
    assert est_d.evaluate(a, rd, b) == pytest.approx(
        est_n.evaluate(a, rn, b), abs=0.02)

    pd = compute_prec_recall(a, b, device=True)
    pn = compute_prec_recall(a, b, device=False)
    np.testing.assert_allclose(pd, pn, atol=0.02)
