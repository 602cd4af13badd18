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


def _make_large_run_dir(tmp_path):
    """Tiny ADM run dir (config.yaml + sampler_last.msgpack) for
    generate_large e2e."""
    import yaml

    cfg = {
        "diffusion": {"image_size": 16, "num_channels": 32,
                      "num_res_blocks": 1, "attention_resolutions": "8",
                      "channel_mult": "1,2", "class_cond": False,
                      "use_fp16": False, "num_head_channels": 16},
        "sampler": {"sample_shape": [3, 16, 16], "n_timesteps": 4,
                    "class_cond": False, "num_classes": 0,
                    "trainable_beta": "fix_last"},
        "data": {"name": "imagenet64"},
    }
    logdir = tmp_path / "run"
    logdir.mkdir()
    (logdir / "config.yaml").write_text(yaml.safe_dump(cfg))

    import jax

    from dxmi_tpu.models.unet_adm import create_unet_adm
    from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
    from dxmi_tpu.utils import checkpoint as ckptlib

    net = create_unet_adm(**cfg["diffusion"])
    sampler = EDMSampler(net, KarrasDenoiser(), **cfg["sampler"])
    params = sampler.init_params(jax.random.key(0))
    ckptlib.save_checkpoint(str(logdir / "sampler_last.msgpack"), params,
                            meta={"iter": 0})
    return logdir


@pytest.mark.slow
@pytest.mark.parametrize("int8", [False, True])
def test_generate_large_smoke(tmp_path, int8):
    """generate_large.py --skip_fid end-to-end (PNG streaming), plain and
    --int8 (static calibration from the loaded checkpoint)."""
    logdir = _make_large_run_dir(tmp_path)
    args = ["generate_large.py", "--log_dir", str(logdir),
            "--sampler", "last", "--n_generate", "8", "--batchsize", "8",
            "--skip_fid"]
    if int8:
        args.append("--int8")
    r = run(args)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    pngs = list((logdir / "generated_last").glob("*.png"))
    assert len(pngs) == 8
