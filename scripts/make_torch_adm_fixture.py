"""Produce a TRAINED golden ADM/EDM run-dir fixture with the REFERENCE
torch stack (VERDICT r3 Missing #1 / task 2).

Mirrors scripts/make_torch_fixture.py for the large-image family:

  1. pretrain a tiny cm ``UNetModel`` with the reference EDM denoising
     loss (models/cm/karras_diffusion.py:82-106) — the reference
     workflow fine-tunes a PRETRAINED EDM checkpoint
     (/root/reference/train_image_large.py:130-140);
  2. DxMI fine-tune with the reference ``DxMI_Trainer_Cond`` +
     ``OpenAIDiffusion`` + ``MixedPrecisionTrainer`` exactly as
     /root/reference/train_image_large.py:248-269 iterates (sample ->
     append_buffer -> update_f_v -> update_sampler_mixed_precision ->
     reset_buffer);
  3. save the reference run-dir contract (config.yaml + sampler.pth
     {'state_dict','fid','i_iter'} + value.pth, train_image_large.py:
     77-85) plus a deterministic trajectory replay ``golden.npz``
     (fixed x_init + labels + per-step eps, per-step mean/sigma, final
     sample, value outputs, trained log_betas).

The committed fixture (tests/fixtures/torch_rundir_adm_t10) gates the
ADM conversion + EDMSampler trajectory parity and the generate_large
default-path drift probes on TRAINED weights (tests/
test_golden_adm_fixture.py, scripts/bench_adm_quality.py).

Checkpoint/resume: DXMI_ADM_FIXTURE_CKPT holds the full training state
every DXMI_ADM_FIXTURE_CKPT_EVERY iters; a rerun resumes exactly (and
refuses checkpoints whose run_meta mismatches).  Never copies reference
code — IMPORTS it read-only (the permitted cross-check pattern).
"""
import os
import sys
import types

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import torch

# shim torchvision (absent in this image; karras_diffusion pulls it
# transitively for a RandomCrop the fixture never uses)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.RandomCrop = object
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt

sys.path.insert(0, "/root/reference")

from models.cm.script_util import create_model_and_diffusion  # noqa: E402
from models.cm.fp16_util import MixedPrecisionTrainer  # noqa: E402
from models.DxMI.openai_diffusion import OpenAIDiffusion  # noqa: E402
from models.DxMI.trainer import (DxMI_Trainer_Cond, append_buffer,  # noqa: E402
                                 reset_buffer)
from models.modules import IGEBMEncoderV2  # noqa: E402
from models.value import TimeIndependentValue  # noqa: E402
from models.cm import unet as cm_unet  # noqa: E402

# The reference's legacy attention force-casts QKV to fp16 even in a
# pure-fp32 forward (cm/unet.py:423), which CRASHES on CPU (half
# activations hit the fp32 proj_out conv) — it only works when the whole
# torso is converted to fp16.  Patch the cast out, exactly as
# tests/test_unet_adm.py does for the parity tests; the fixture trains
# and replays in genuine fp32.
_orig_qkv_forward = cm_unet.QKVAttentionLegacy.forward


def _fp32_qkv_forward(self, qkv):
    half = torch.Tensor.half
    torch.Tensor.half = lambda s: s
    try:
        return _orig_qkv_forward(self, qkv)
    finally:
        torch.Tensor.half = half


cm_unet.QKVAttentionLegacy.forward = _fp32_qkv_forward

T, RES, CH, NH, B = 10, 16, 32, 32, 16
N_CLASS = 4
PRETRAIN_ITERS = int(os.environ.get("DXMI_ADM_PRETRAIN_ITERS", "600"))
N_ITERS = int(os.environ.get("DXMI_ADM_FIXTURE_ITERS", "1500"))
SEED = 11
OUT = os.environ.get(
    "DXMI_ADM_FIXTURE_OUT",
    os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                 "torch_rundir_adm_t10"))

# tiny ImageNet64-T10-shaped config: same knobs as
# configs/imagenet64/T10.yaml's diffusion section, scaled to 16x16 / 32ch
DIFFUSION_CFG = dict(
    sigma_min=0.002, sigma_max=80.0, image_size=RES, num_channels=CH,
    num_res_blocks=1, num_heads=2, num_heads_upsample=-1,
    num_head_channels=-1, attention_resolutions="8", channel_mult="1,2",
    dropout=0.0, class_cond=True, use_checkpoint=False,
    use_scale_shift_norm=True, resblock_updown=True, use_fp16=False,
    use_new_attention_order=False, learn_sigma=False,
    weight_schedule="uniform", distillation=False)


def make_data(n: int, rng: np.random.Generator):
    """Class-structured synthetic 16x16 images in [-1,1]: per-class base
    orientation + a class-colored blob, so the conditional nets have
    label signal to learn."""
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / (RES - 1)
    imgs = np.empty((n, 3, RES, RES), np.float32)
    labels = rng.integers(0, N_CLASS, n).astype(np.int64)
    dirs = [(1, 0), (0, 1), (1, 1), (1, -1)]
    for i in range(n):
        c = int(labels[i])
        a, b = dirs[c]
        base = 0.5 + 0.35 * (a * xx + b * yy) / (abs(a) + abs(b))
        cx, cy = rng.uniform(0.25, 0.75, 2)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.03))
        for ch3 in range(3):
            w = 1.0 if ch3 == c % 3 else 0.3
            imgs[i, ch3] = np.clip(
                base * rng.uniform(0.6, 1.0) + w * 0.5 * blob
                + rng.normal(0, 0.02, (RES, RES)), 0, 1)
    return 2.0 * imgs - 1.0, labels


def main():
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    rng = np.random.default_rng(SEED)

    unet, diffusion = create_model_and_diffusion(**DIFFUSION_CFG)
    # create_model hardcodes NUM_CLASSES=1000 (script_util.py); the
    # fixture needs a 4-class embed, so rebuild the label_emb only
    unet.label_emb = torch.nn.Embedding(N_CLASS, CH * 4)
    n_params = sum(p.numel() for p in unet.parameters())
    print(f"unet params: {n_params / 1e6:.3f}M", flush=True)

    data, labels = make_data(16 * B, rng)
    data_t = torch.from_numpy(data)
    labels_t = torch.from_numpy(labels)

    ckpt_path = os.environ.get("DXMI_ADM_FIXTURE_CKPT",
                               "/tmp/adm_fixture_train_ckpt.pt")
    ckpt_every = int(os.environ.get("DXMI_ADM_FIXTURE_CKPT_EVERY", "25"))
    run_meta = {"seed": SEED, "pretrain": PRETRAIN_ITERS, "n_iters": N_ITERS,
                "arch": (T, RES, CH, NH, B, N_CLASS)}

    # ---- stage 1: EDM denoising pretrain (reference loss) ----
    pre_opt = torch.optim.Adam(unet.parameters(), lr=2e-4)
    start_pre, start_it = 0, 0
    ck = None
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        if ck.get("run_meta") != run_meta:
            raise SystemExit(
                f"stale checkpoint {ckpt_path}: run_meta {ck.get('run_meta')}"
                f" != current {run_meta}; delete it to restart")
        start_pre = ck["pre_iter"] + 1

    if ck is not None and "net" not in ck:  # mid-pretrain checkpoint
        unet.load_state_dict(ck["pre_net"])
        pre_opt.load_state_dict(ck["pre_opt"])
        torch.set_rng_state(ck["torch_rng"])
        rng.bit_generator.state = ck["np_rng"]
        print(f"resumed pretrain at iter {start_pre}", flush=True)

    if ck is None or "net" not in ck:
        for it in range(start_pre, PRETRAIN_ITERS):
            idx = rng.integers(0, len(data_t), B)
            x0 = data_t[idx]
            y = labels_t[idx]
            # EDM lognormal sigma draw (P_mean=-1.2, P_std=1.2)
            sig = torch.exp(torch.randn(B) * 1.2 - 1.2)
            terms = diffusion.training_losses(unet, x0, sig,
                                              model_kwargs={"y": y})
            loss = terms["loss"].mean()
            pre_opt.zero_grad()
            loss.backward()
            pre_opt.step()
            if it % 50 == 0 or it == PRETRAIN_ITERS - 1:
                print(f"pretrain {it:4d}  mse={loss.item():.4f}", flush=True)
            if (it + 1) % ckpt_every == 0:
                torch.save({"pre_net": unet.state_dict(),
                            "pre_opt": pre_opt.state_dict(),
                            "torch_rng": torch.get_rng_state(),
                            "np_rng": rng.bit_generator.state,
                            "pre_iter": it, "iter": -1,
                            "run_meta": run_meta}, ckpt_path + ".tmp")
                os.replace(ckpt_path + ".tmp", ckpt_path)

    # ---- stage 2: DxMI fine-tune (reference trainer, cond path) ----
    sampler = OpenAIDiffusion(unet, diffusion, n_timesteps=T,
                              sample_shape=[3, RES, RES], class_cond=True,
                              num_classes=N_CLASS, trainable_beta="fix_last",
                              sigma_min=0.002, sigma_max=80.0)
    value = TimeIndependentValue(net=IGEBMEncoderV2(
        in_chan=3, out_chan=1, use_spectral_norm=False, keepdim=False,
        out_activation="linear", avg_pool_dim=1, learn_out_scale=True,
        nh=NH))

    mp_trainer = MixedPrecisionTrainer(model=unet, use_fp16=False,
                                       special_key="log_betas")
    # master_params[0] is log_betas (registered first on the top module,
    # train_image_large.py:158-162)
    assert mp_trainer.master_params[0] is unet.log_betas
    opt = torch.optim.RAdam(
        [{"params": mp_trainer.master_params[1:], "lr": 1e-4},
         {"params": mp_trainer.master_params[0:1], "lr": 1e-3}],
        weight_decay=0.0)
    opt_v = torch.optim.Adam(value.parameters(), lr=1e-4)

    trainer = DxMI_Trainer_Cond(
        batchsize=B, tau1=0.1, tau2=0.01, gamma=1, n_timesteps=T,
        use_sampler_beta=True, adavelreg=0.99, entropy_in_value=None,
        velocity_in_value=None, value_grad_clip=True, time_cost=0,
        skip_sampler_tau=3, time_cost_sig=1)
    trainer.set_models(v=value, sampler=sampler, optimizer=opt,
                       optimizer_v=opt_v)

    if ck is not None and "net" in ck:  # mid-DxMI checkpoint
        unet.load_state_dict(ck["net"])
        value.load_state_dict(ck["value"])
        opt.load_state_dict(ck["opt"])
        opt_v.load_state_dict(ck["opt_v"])
        trainer.betas_for_q = ck["betas_for_q"]
        torch.set_rng_state(ck["torch_rng"])
        rng.bit_generator.state = ck["np_rng"]
        start_it = ck["iter"] + 1
        print(f"resumed DxMI at iter {start_it}", flush=True)

    state_dict = reset_buffer("cpu")
    for it in range(start_it, N_ITERS):
        idx = rng.integers(0, len(data_t), B)
        img = data_t[idx]
        y = labels_t[idx]
        sampler.eval()
        d_sample = sampler.sample(B, device="cpu", i_class=y)
        append_buffer(state_dict, d_sample)
        d_energy = trainer.update_f_v(img, d_sample, state_dict, y=y)
        d_gen = trainer.update_sampler_mixed_precision(
            state_dict, mp_trainer=mp_trainer, d_sample=d_sample)
        state_dict = reset_buffer("cpu")
        if it % 25 == 0 or it == N_ITERS - 1:
            print(f"iter {it:4d}  v_loss={d_energy.get('ebm/v_loss_', float('nan')):.4f} "
                  f"d_loss={d_energy.get('ebm/d_loss_', float('nan')):.4f} "
                  f"sampler_loss={d_gen.get('sampler/sampler_loss_', float('nan')):.4f}",
                  flush=True)
        if (it + 1) % ckpt_every == 0:
            torch.save({"net": unet.state_dict(),
                        "value": value.state_dict(),
                        "opt": opt.state_dict(),
                        "opt_v": opt_v.state_dict(),
                        "betas_for_q": trainer.betas_for_q,
                        "torch_rng": torch.get_rng_state(),
                        "np_rng": rng.bit_generator.state,
                        "pre_iter": PRETRAIN_ITERS - 1, "iter": it,
                        "run_meta": run_meta}, ckpt_path + ".tmp")
            os.replace(ckpt_path + ".tmp", ckpt_path)

    # ---- run dir (reference train_image_large.py:77-85 contract) ----
    os.makedirs(OUT, exist_ok=True)
    torch.save({"state_dict": unet.state_dict(), "fid": 0.0,
                "i_iter": N_ITERS}, os.path.join(OUT, "sampler.pth"))
    torch.save({"state_dict": value.state_dict()},
               os.path.join(OUT, "value.pth"))

    with open(os.path.join(OUT, "config.yaml"), "w") as fh:
        fh.write(f"""\
# Golden ADM fixture run dir: reference-format config + checkpoints from
# scripts/make_torch_adm_fixture.py ({PRETRAIN_ITERS} EDM-pretrain +
# {N_ITERS} DxMI_Trainer_Cond CPU steps on synthetic 4-class data).
# num_classes: {N_CLASS} deviates from the reference create_model's
# hardcoded NUM_CLASSES=1000 (script_util.py) — the fixture's label_emb
# is rebuilt at {N_CLASS} classes; our create_unet_adm accepts it.
diffusion:
  sigma_min: 0.002
  sigma_max: 80.0
  image_size: {RES}
  num_channels: {CH}
  num_res_blocks: 1
  num_heads: 2
  num_heads_upsample: -1
  num_head_channels: -1
  attention_resolutions: "8"
  channel_mult: "1,2"
  dropout: 0.0
  class_cond: True
  num_classes: {N_CLASS}
  use_checkpoint: False
  use_scale_shift_norm: True
  resblock_updown: True
  use_fp16: False
  use_new_attention_order: False
  learn_sigma: False
  weight_schedule: uniform
  distillation: False

sampler:
  sample_shape: [3, {RES}, {RES}]
  n_timesteps: {T}
  class_cond: True
  num_classes: {N_CLASS}
  trainable_beta: fix_last
  sigma_min: 0.002
  sigma_max: 80.0

trainer:
  _target_: models.DxMI.trainer.DxMI_Trainer_Cond
  tau1: 0.1
  tau2: 0.01
  gamma: 1
  n_timesteps: {T}
  use_sampler_beta: true
  adavelreg: 0.99
  entropy_in_value: null
  velocity_in_value: null
  value_grad_clip: true
  time_cost: 0
  skip_sampler_tau: 3
  time_cost_sig: 1

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

training:
  seed: {SEED}
  batchsize: {B}

data:
  name: adm_fixture_synthetic
  image_size: {RES}
  class_cond: True
  n_class: {N_CLASS}
""")

    # ---- golden trajectory replay on the trained weights ----
    torch.manual_seed(SEED + 1)
    GB = 8
    x_init = torch.randn(GB, 3, RES, RES) * sampler.sigma_max
    y = torch.arange(GB, dtype=torch.long) % N_CLASS
    eps = torch.randn(T, GB, 3, RES, RES)
    means, sigmas = [], []
    x = x_init.clone()
    unet.eval()
    with torch.no_grad():
        for t in range(T):
            out = sampler.sample_step(
                x, t * torch.ones(GB, dtype=torch.long), y=y)
            means.append(out["mean"].numpy().copy())
            sig = out["sigma"]
            if sig.dim() == 0:
                sig = sig.view(1, 1, 1, 1)
            while sig.dim() < 4:
                sig = sig.unsqueeze(-1)
            sig_b = np.broadcast_to(sig.numpy(), (GB, 1, 1, 1)).astype(
                np.float32).copy()
            sigmas.append(sig_b)
            x = out["mean"] + torch.from_numpy(sig_b) * eps[t]
        v_out = value(x, torch.full((GB,), T, dtype=torch.long),
                      y=y).numpy().copy()
    np.savez(os.path.join(OUT, "golden.npz"),
             x_init=x_init.numpy(), y=y.numpy(), eps=eps.numpy(),
             means=np.stack(means), sigmas=np.stack(sigmas),
             final=x.numpy(), v_out=v_out,
             log_betas=unet.log_betas.detach().numpy(),
             sigmas_grid=sampler.sigmas.numpy())
    total = sum(os.path.getsize(os.path.join(OUT, f))
                for f in os.listdir(OUT))
    print(f"fixture written to {OUT} ({total / 1e6:.2f} MB)", flush=True)
    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)


if __name__ == "__main__":
    main()
