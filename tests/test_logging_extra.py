"""kvlogger / profiling / checkpoint-orbax tests."""
import json
import os
import time

import numpy as np


def test_kvlogger_mean_and_dump(tmp_path):
    from dxmi_tpu.utils.kvlogger import KVLogger

    kv = KVLogger(str(tmp_path), formats=("csv", "json"))
    kv.logkv("lr", 1e-4)
    kv.logkv_mean("loss", 1.0)
    kv.logkv_mean("loss", 3.0)
    d = kv.dumpkvs()
    assert d["loss"] == 2.0
    kv.logkv("loss", 5.0)
    kv.logkv("new_key", 7)
    kv.dumpkvs()

    with open(tmp_path / "progress.json") as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["loss"] == 2.0
    assert rows[1]["new_key"] == 7
    csv = (tmp_path / "progress.csv").read_text().splitlines()
    assert "loss" in csv[0] and "new_key" in csv[0]


def test_kvlogger_log_and_tensorboard_formats(tmp_path):
    """'log' writes the human table to log.txt; 'tensorboard' writes TB
    events when tensorboardX is present (reference make_output_format,
    models/cm/logger.py:191-204)."""
    from dxmi_tpu.utils.kvlogger import KVLogger, configure

    kv = KVLogger(str(tmp_path), formats=("log", "tensorboard"))
    kv.logkv("grad_norm", 0.5)
    kv.dumpkvs()
    txt = (tmp_path / "log.txt").read_text()
    assert "grad_norm" in txt
    try:
        import tensorboardX  # noqa: F401

        assert os.listdir(tmp_path / "tb")
    except ImportError:
        pass

    # DXMI_LOG_FORMAT env selects formats through configure()
    os.environ["DXMI_LOG_FORMAT"] = "log"
    try:
        lg = configure(str(tmp_path / "cfg"))
        assert lg._log is not None and lg._csv is None and not lg.stdout
    finally:
        del os.environ["DXMI_LOG_FORMAT"]


def test_phase_timer():
    from dxmi_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    s = t.summary()
    assert 5 <= s["time/a_ms_"] <= 500
    t.reset()
    assert not t.summary()


def test_orbax_roundtrip(tmp_path):
    from dxmi_tpu.utils import checkpoint as C

    tree = {"a": np.arange(6.0).reshape(2, 3), "b": {"c": np.ones(4)}}
    path = str(tmp_path / "ck")
    C.save_checkpoint_orbax(path, tree)
    back = C.load_checkpoint_orbax(path, like=tree)
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["b"]["c"], tree["b"]["c"])


def test_resolve_run_checkpoint_order(tmp_path):
    """Run-dir resolution follows the reference's back-compat order
    (generate_cifar10.py:133-140): postfixed msgpack, bare msgpack, then
    torch files."""
    from dxmi_tpu.utils import checkpoint as C

    with np.testing.assert_raises(FileNotFoundError):
        C.resolve_run_checkpoint(str(tmp_path), "sampler", "best")

    (tmp_path / "sampler.pth").write_bytes(b"x")
    p, fmt = C.resolve_run_checkpoint(str(tmp_path), "sampler", "best")
    assert p.endswith("sampler.pth") and fmt == "torch"

    C.save_checkpoint(str(tmp_path / "sampler.msgpack"), {"w": np.ones(2)})
    p, fmt = C.resolve_run_checkpoint(str(tmp_path), "sampler", "best")
    assert p.endswith("sampler.msgpack") and fmt == "msgpack"

    C.save_checkpoint(str(tmp_path / "sampler_best.msgpack"),
                      {"w": np.zeros(2)})
    p, fmt = C.resolve_run_checkpoint(str(tmp_path), "sampler", "best")
    assert p.endswith("sampler_best.msgpack")

    payload, path = C.load_run_checkpoint(str(tmp_path), "sampler", "best")
    assert np.asarray(payload["params"]["w"]).sum() == 0
