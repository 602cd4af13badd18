"""Produce a golden torch run-dir fixture by actually training the
REFERENCE implementation (imported read-only from /root/reference) for a
few hundred CPU steps on structured synthetic data.

Outputs (committed under tests/fixtures/torch_rundir_t10/):
  config.yaml       — reference-format config (reference _target_ paths)
  sampler_best.pth  — {"state_dict": net.state_dict(), "fid": ..., ...}
                      exactly the reference save_model contract
                      (/root/reference/train_cifar10.py:57-76)
  value_best.pth    — {"state_dict": value.state_dict()}
  golden.npz        — deterministic trajectory replay on TRAINED weights:
                      fixed x0 + per-step eps, recorded mean/sigma per
                      step (sample_step is deterministic given x,t), the
                      final sample, and value-net outputs. The fast test
                      replays this through dxmi_tpu's converted sampler
                      with the same eps and compares.

Run:  OMP_NUM_THREADS=4 python scripts/make_torch_fixture.py
"""
from __future__ import annotations

import os
import sys
import types

os.environ.setdefault("OMP_NUM_THREADS", "4")

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "torch_rundir_t10")

# shim torchvision (absent in this image; pulled transitively)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.RandomCrop = object
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt

sys.path.insert(0, REFERENCE)
import models.DxMI.var_sampler as _vs  # noqa: E402

# numpy>=2.0 quirk (documented in tests/test_schedules.py): the
# reference's continuous-step bisection needs float64 Beta or the
# flat-region search degrades and VAR_get_params' tau_last assert trips.
_orig_precompute = _vs._precompute_VAR_steps


def _precompute64(dh, eta):
    dh = dict(dh)
    dh["Beta"] = dh["Beta"].to(torch.float64)
    return _orig_precompute(dh, eta)


_vs._precompute_VAR_steps = _precompute64

from models.DxMI.trainer import DxMI_Trainer, append_buffer, reset_buffer  # noqa: E402
from models.DxMI.unet_small import Model  # noqa: E402
from models.DxMI.var_sampler import VARSampler  # noqa: E402
from models.modules import IGEBMEncoderV2  # noqa: E402
from models.value import TimeIndependentValue  # noqa: E402

T, RES, CH, NH, B = 10, 16, 32, 32, 32
# round-2 fixture was 150 steps; VERDICT r2 weak #4 asks for a
# few-thousand-step fixture so the int8/fused-attn quality gates run on
# weights with non-toy statistics
N_ITERS = int(os.environ.get("DXMI_FIXTURE_ITERS", "3000"))
SEED = 7


def make_data(n: int, rng: np.random.Generator) -> np.ndarray:
    """Structured synthetic images in [0,1]: smooth color gradients with a
    bright blob — enough signal for the EBM/value nets to move off init."""
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / (RES - 1)
    imgs = np.empty((n, 3, RES, RES), np.float32)
    for i in range(n):
        a, b, c = rng.uniform(-1, 1, 3)
        base = 0.5 + 0.4 * (a * xx + b * yy + c * xx * yy)
        cx, cy = rng.uniform(0.2, 0.8, 2)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.02))
        for ch3 in range(3):
            w = rng.uniform(0.2, 1.0)
            imgs[i, ch3] = np.clip(base * w + 0.6 * blob * rng.uniform(0, 1)
                                   + rng.normal(0, 0.02, (RES, RES)), 0, 1)
    return imgs


def main():
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    rng = np.random.default_rng(SEED)

    net = Model(resolution=RES, in_channels=3, out_ch=3, ch=CH,
                ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[8],
                dropout=0.1)
    sampler = VARSampler(net=net, n_timesteps=T, sample_shape=[3, RES, RES],
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoderV2(
        in_chan=3, out_chan=1, use_spectral_norm=False, keepdim=False,
        out_activation="linear", avg_pool_dim=1, learn_out_scale=True,
        nh=NH))

    n_params = sum(p.numel() for p in net.parameters())
    print(f"sampler net params: {n_params/1e6:.3f}M")

    params_not_beta = [p for name, p in net.named_parameters()
                       if "log_betas" not in name]
    opt = torch.optim.Adam([
        {"params": [net.log_betas], "lr": 1e-3},
        {"params": params_not_beta, "lr": 1e-4},
    ])
    opt_v = torch.optim.Adam(value.parameters(), lr=1e-4)

    trainer = DxMI_Trainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1,
                           n_timesteps=T, use_sampler_beta=True,
                           adavelreg=0.99, time_cost=0, time_cost_sig=True,
                           entropy_in_value=None, velocity_in_value=None)
    trainer.set_models(f=None, v=value, sampler=sampler, optimizer=opt,
                       optimizer_fstar=None, optimizer_v=opt_v)

    data = make_data(8 * B, rng)
    state_dict = reset_buffer("cpu")

    # Checkpoint/resume: two prior 3000-iter attempts died at 2000/2800
    # iters with nothing recoverable (PERF.md "Fixture-hardening status").
    # Every DXMI_FIXTURE_CKPT_EVERY iters the full training state (nets,
    # both Adams, torch+numpy RNG) goes to a scratch file; a rerun picks
    # up exactly where the dead one stopped.
    ckpt_path = os.environ.get("DXMI_FIXTURE_CKPT",
                               "/tmp/fixture_train_ckpt.pt")
    ckpt_every = int(os.environ.get("DXMI_FIXTURE_CKPT_EVERY", "50"))
    run_meta = {"seed": SEED, "n_iters": N_ITERS,
                "arch": (T, RES, CH, NH, B)}
    start_it = 0
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        ck_meta = ck.get("run_meta")
        if ck_meta != run_meta:
            raise SystemExit(
                f"stale checkpoint {ckpt_path}: run_meta {ck_meta} != "
                f"current {run_meta}; delete it to restart from scratch")
        net.load_state_dict(ck["net"])
        value.load_state_dict(ck["value"])
        opt.load_state_dict(ck["opt"])
        opt_v.load_state_dict(ck["opt_v"])
        torch.set_rng_state(ck["torch_rng"])
        rng.bit_generator.state = ck["np_rng"]
        start_it = ck["iter"] + 1
        print(f"resumed from {ckpt_path} at iter {start_it}", flush=True)

    for it in range(start_it, N_ITERS):
        idx = rng.integers(0, len(data), B)
        images = torch.from_numpy(2 * data[idx] - 1)
        sampler.eval()
        d_sample = sampler.sample(B, device="cpu")
        append_buffer(state_dict, d_sample)
        d_energy = trainer.update_f_v(images, d_sample, state_dict)
        d_gen = trainer.update_sampler(state_dict, n_generator=1)
        # reference resets the buffer after every sampler update
        # (train_cifar10.py:193, n_critic=1)
        state_dict = reset_buffer("cpu")
        if it % 50 == 0 or it == N_ITERS - 1:
            print(f"iter {it:4d}  v_loss={d_energy.get("ebm/v_loss_", float("nan")):.4f} "
                  f"sampler_loss={d_gen.get("sampler/sampler_loss_", float("nan")):.4f}",
                  flush=True)
        if (it + 1) % ckpt_every == 0:
            torch.save({"net": net.state_dict(),
                        "value": value.state_dict(),
                        "opt": opt.state_dict(),
                        "opt_v": opt_v.state_dict(),
                        "torch_rng": torch.get_rng_state(),
                        "np_rng": rng.bit_generator.state,
                        "iter": it,
                        "run_meta": run_meta},
                       ckpt_path + ".tmp")
            os.replace(ckpt_path + ".tmp", ckpt_path)

    os.makedirs(OUT, exist_ok=True)
    torch.save({"state_dict": net.state_dict(), "fid": 0.0, "epoch": 0,
                "iter": N_ITERS}, os.path.join(OUT, "sampler_best.pth"))
    torch.save({"state_dict": value.state_dict()},
               os.path.join(OUT, "value_best.pth"))

    with open(os.path.join(OUT, "config.yaml"), "w") as fh:
        fh.write(f"""\
# Golden fixture run dir: genuine reference-format config + checkpoints
# produced by scripts/make_torch_fixture.py (reference trainer, {N_ITERS}
# CPU steps on synthetic data).
sampler_net:
  _target_: models.DxMI.unet_small.Model
  resolution: {RES}
  in_channels: 3
  out_ch: 3
  ch: {CH}
  ch_mult: [1,2]
  num_res_blocks: 1
  attn_resolutions: [8]
  dropout: 0.1

sampler:
  _target_: models.DxMI.var_sampler.VARSampler
  n_timesteps: {T}
  sample_shape: [3, {RES}, {RES}]
  trainable_beta: fix_last

energy: Null

value:
  _target_: models.value.TimeIndependentValue
  net:
    _target_: models.modules.IGEBMEncoderV2
    in_chan: 3
    out_chan: 1
    use_spectral_norm: False
    keepdim: False
    out_activation: linear
    avg_pool_dim: 1
    learn_out_scale: True
    nh: {NH}

trainer:
  _target_: models.DxMI.trainer.DxMI_Trainer
  tau1: 0.1
  tau2: 0.01
  gamma: 1
  use_sampler_beta: True
  time_cost: 0
  adavelreg: 0.99
  entropy_in_value: Null
  velocity_in_value: Null
  time_cost_sig: True

training:
  batchsize: {B}
  lr: 1e-4
  v_lr: 1e-4
  beta_lr: 1e-3
  seed: {SEED}

data:
  name: cifar10
""")

    # ---- golden trajectory replay on the trained weights ----
    torch.manual_seed(SEED + 1)
    GB = 8
    x0 = torch.randn(GB, 3, RES, RES)
    eps = torch.randn(T, GB, 3, RES, RES)
    means, sigmas = [], []
    x = x0.clone()
    net.eval()
    with torch.no_grad():
        for t in range(T):
            out = sampler.sample_step(x, t)
            mean = out["mean"]
            sigma = out["sigma"]
            means.append(mean.numpy().copy())
            sig = sigma
            if sig.dim() == 0:
                sig = sig.view(1, 1, 1, 1)
            sigmas.append(np.broadcast_to(
                sig.numpy(), (GB, 1, 1, 1)).astype(np.float32).copy())
            x = mean + sig * eps[t]
        v_out = value(x, torch.full((GB,), T - 1)).numpy().copy()
    np.savez(os.path.join(OUT, "golden.npz"),
             x0=x0.numpy(), eps=eps.numpy(),
             means=np.stack(means), sigmas=np.stack(sigmas),
             final=x.numpy(), v_out=v_out,
             log_betas=net.log_betas.detach().numpy())
    total = sum(os.path.getsize(os.path.join(OUT, f))
                for f in os.listdir(OUT))
    print(f"fixture written to {OUT} ({total/1e6:.2f} MB)")
    # the scratch checkpoint is only for crash recovery of THIS run; a
    # later regeneration must not silently resume from it
    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)


if __name__ == "__main__":
    main()
