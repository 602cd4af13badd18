"""Reference-trainer A/B for the 2D convergence proof (VERDICT r2 #2).

Runs the REFERENCE torch DxMI trainer (/root/reference/models/DxMI/
trainer.py:73-408 + var_sampler.py) on the 8gaussians task with the SAME
pretrained policy weights and hyperparameters as a dxmi_tpu train_2d.py
run, recording the same mean true-pdf log-likelihood curve. Comparing
the two curves validates that dxmi_tpu's training dynamics match the
reference end-to-end (not just per-step parity on injected states).

The reference represents samples as 4D tensors (var_sampler.py
unsqueeze3x), so 2D points ride as (B, 2, 1, 1). The torch policy/value
MLPs mirror dxmi_tpu.models.mlp exactly (same timestep embedding, same
layer shapes); the policy loads the jax pretrain cache written by
  python train_2d.py --pretrain_cache <msgpack> ...

Usage:
  OMP_NUM_THREADS=1 python scripts/convergence_2d_torch.py \
      --pretrain_cache /tmp/pre2d_weak.msgpack --n_iter 4000 \
      --lr 1e-5 --v_lr 1e-4 --beta_lr 1e-5 --tau1 0.01 --tau2 0.01 \
      --curve_out /tmp/curve_torch.json
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn

# the reference's karras_diffusion imports torchvision (absent in this
# image) only for RandomCrop; stub it (same trick as tests/test_distill.py)
import types

if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.RandomCrop = object
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt


def timestep_embedding_torch(t, dim):
    """Mirror of dxmi_tpu.models.unet_small.timestep_embedding."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / (half - 1))
    r = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(r), torch.cos(r)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


class TorchEpsMLP(nn.Module):
    """torch mirror of dxmi_tpu.models.mlp.EpsMLP on (B,2,1,1) tensors."""

    def __init__(self, hidden=(128, 128, 128), in_dim=2, temb_dim=32):
        super().__init__()
        self.temb_dim = temb_dim
        dims = [in_dim + temb_dim] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1]) for i in range(len(hidden)))
        self.out = nn.Linear(dims[-1], in_dim)

    def forward(self, x, t):
        shape = x.shape
        x2 = x.reshape(len(x), -1)
        if t.dim() == 0:
            t = t.expand(len(x))
        h = torch.cat([x2, timestep_embedding_torch(t, self.temb_dim)], -1)
        for lin in self.layers:
            h = torch.nn.functional.silu(lin(h))
        return self.out(h).reshape(shape)


class TorchValueMLP(nn.Module):
    """torch mirror of dxmi_tpu.models.mlp.ValueMLP (time-dependent)."""

    def __init__(self, hidden=(128, 128), temb_dim=32):
        super().__init__()
        self.temb_dim = temb_dim
        dims = [2 + temb_dim] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1]) for i in range(len(hidden)))
        self.out = nn.Linear(dims[-1], 1)

    def forward(self, x, t):
        x2 = x.reshape(len(x), -1)
        if not torch.is_tensor(t):
            t = torch.tensor(t)
        if t.dim() == 0:
            t = t.expand(len(x2))
        h = torch.cat([x2, timestep_embedding_torch(t, self.temb_dim)], -1)
        for lin in self.layers:
            h = torch.nn.functional.silu(lin(h))
        return self.out(h)


def flax_init_(module: nn.Module, seed: int):
    """Re-initialize all Linears to flax Dense defaults (lecun_normal
    kernel, zero bias) so the torch value net starts from the same
    distribution as dxmi_tpu's ValueMLP — adversarial training dynamics
    are init-sensitive, and torch's kaiming_uniform default differs."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, nn.Linear):
                fan_in = m.weight.shape[1]
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * (1.0 / fan_in) ** 0.5)
                m.bias.zero_()


def load_jax_pretrain(net: TorchEpsMLP, path: str):
    """Load the msgpack net params written by train_2d.py --pretrain_cache."""
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        tree = msgpack_restore(f.read())
    with torch.no_grad():
        for i, lin in enumerate(net.layers):
            p = tree[f"dense_{i}"]
            lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        net.out.weight.copy_(torch.from_numpy(np.asarray(tree["out"]["kernel"]).T))
        net.out.bias.copy_(torch.from_numpy(np.asarray(tree["out"]["bias"])))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain_cache", required=True)
    p.add_argument("--n_timesteps", type=int, default=10)
    p.add_argument("--n_iter", type=int, default=4000)
    p.add_argument("--batchsize", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--v_lr", type=float, default=1e-4)
    p.add_argument("--beta_lr", type=float, default=1e-5)
    p.add_argument("--tau1", type=float, default=0.01)
    p.add_argument("--tau2", type=float, default=0.01)
    p.add_argument("--eval_every", type=int, default=400)
    p.add_argument("--eval_n", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--curve_out", default="/tmp/curve_torch.json")
    p.add_argument("--flax_init", action="store_true",
                   help="initialize the value net from flax Dense "
                        "defaults (lecun_normal, zero bias)")
    args = p.parse_args()

    torch.manual_seed(args.seed)
    rng = np.random.RandomState(args.seed)

    from models.DxMI.trainer import (DxMI_Trainer, append_buffer,
                                     reset_buffer)
    from models.DxMI.var_sampler import VARSampler

    # data + true pdf from dxmi_tpu (value-identical to the reference
    # loader/synthetic.py, tested)
    from dxmi_tpu.data.synthetic import pdf_8gaussian, sample2d

    net = TorchEpsMLP()
    load_jax_pretrain(net, args.pretrain_cache)
    sampler = VARSampler(net, args.n_timesteps, (2, 1, 1),
                         trainable_beta="fix_last")
    value = TorchValueMLP()
    if args.flax_init:
        flax_init_(value, args.seed + 777)

    optimizer = torch.optim.Adam([
        {"params": [q for n, q in net.named_parameters()
                    if n != "log_betas"], "lr": args.lr},
        {"params": [net.log_betas], "lr": args.beta_lr},
    ])
    optimizer_v = torch.optim.Adam(value.parameters(), lr=args.v_lr)

    trainer = DxMI_Trainer(batchsize=args.batchsize, tau1=args.tau1,
                           tau2=args.tau2, gamma=1, use_sampler_beta=True,
                           adavelreg=0.99, n_timesteps=args.n_timesteps,
                           time_cost=0, time_cost_sig=1.0)
    trainer.set_models(f=None, v=value, sampler=sampler,
                       optimizer=optimizer, optimizer_fstar=None,
                       optimizer_v=optimizer_v)

    def eval_ll(i):
        with torch.no_grad():
            d = sampler.sample(args.eval_n, device="cpu")
        s = d["sample"].reshape(args.eval_n, 2).numpy()
        return float(np.log(pdf_8gaussian(s) + 1e-12).mean())

    curve = [{"iter": 0, "loglik": eval_ll(0)}]
    print(f"iter 0 (post-pretrain) loglik={curve[0]['loglik']:.4f}",
          flush=True)

    for i_iter in range(args.n_iter):
        img = torch.from_numpy(
            sample2d("8gaussians", args.batchsize, rng)).reshape(-1, 2, 1, 1)
        with torch.no_grad():
            d_sample = sampler.sample(args.batchsize, device="cpu")
        buf = append_buffer(reset_buffer("cpu"), d_sample)
        m1 = trainer.update_f_v(img, d_sample, buf)
        m2 = trainer.update_sampler(buf, n_generator=1)
        if i_iter % 200 == 0:
            print(f"iter {i_iter} d_loss={m1['ebm/d_loss_']:.4f} "
                  f"sampler_loss={m2['sampler/sampler_loss_']:.4f}",
                  flush=True)
        if (i_iter + 1) % args.eval_every == 0:
            ll = eval_ll(i_iter + 1)
            curve.append({"iter": i_iter + 1, "loglik": ll})
            print(f"iter {i_iter + 1} loglik={ll:.4f}", flush=True)

    with open(args.curve_out, "w") as f:
        json.dump({"config": vars(args), "curve": curve}, f, indent=1)
    print(f"curve saved to {args.curve_out}")


if __name__ == "__main__":
    main()
