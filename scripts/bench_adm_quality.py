"""Quality gate for the generate_large DEFAULT paths on TRAINED ADM
weights (VERDICT r3 task 2 / weak #3).

Round-3's gate table covered the CIFAR bench path on the trained CIFAR
fixture; the ADM/large-image defaults (``--attn_impl fused``,
``--up_impl phase``, ``--int8``) were gated only by random/perturbed-
weight probes.  This script runs the gate protocol on the committed
trained ADM fixture (tests/fixtures/torch_rundir_adm_t10, reference
EDM-pretrain + DxMI_Trainer_Cond fine-tune):

  einsum_resize seed A/B  -> Frechet(fpA, fpB) = sampling-noise FLOOR
  fused_resize            -> the fused-attention kernel default
  fused_phase             -> + phase-decomposed decoder upsample
  fused_phase_int8        -> + --int8 (W8A8 ResBlock convs)
  fused_phase_int8_i8attn -> + int8-native fused attention
                             (DXMI_QUANT_ATTN path)

Features: Flax FID InceptionV3 with RANDOM weights (fixed seed 0) — a
CONSISTENT COMPARATOR ONLY (zero-egress container, no trained Inception
weights); plus matched-seed pixel drift vs the einsum_resize trajectory.

Run (chip): python scripts/bench_adm_quality.py [-n 2048]
CPU fallback: DXMI_FUSED_ATTN_FORCE=1 DXMI_PLATFORM=cpu (interpret-mode
pallas; keep -n small).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import numpy as np
import jax

if os.environ.get("DXMI_PLATFORM"):  # sitecustomize ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])
import jax.numpy as jnp

from dxmi_tpu import config as cfglib
from dxmi_tpu.fid import stats as stats_lib
from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params
from dxmi_tpu.models.unet_adm import create_unet_adm
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.utils import checkpoint as ckptlib

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "tests", "fixtures", "torch_rundir_adm_t10")


def build(cfg, *, attn_impl, up_impl, quant=False, quant_attn=False):
    dcfg = dict(cfg["diffusion"])
    sigma_min = dcfg.pop("sigma_min")
    sigma_max = dcfg.pop("sigma_max")
    dcfg.pop("weight_schedule", None)
    distillation = dcfg.pop("distillation", False)
    net = create_unet_adm(**dcfg, attn_impl=attn_impl, up_impl=up_impl,
                          quant_int8=("static" if quant else False),
                          quant_attn=("static" if quant_attn else False))
    den = KarrasDenoiser(sigma_min=sigma_min, sigma_max=sigma_max,
                         distillation=distillation)
    return EDMSampler(net, den, **cfg["sampler"])


def generate(sampler, params, key, n, batch):
    nb = n // batch
    out = jax.jit(lambda p, k: sample_many(sampler, p, k, nb, batch))(
        params, key)
    x = np.asarray(out.reshape(-1, *out.shape[2:]), np.float32)
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0)


def feature_stats(extract, x01, batch=128):
    feats = []
    for i in range(0, len(x01), batch):
        feats.append(np.asarray(extract(jnp.asarray(x01[i:i + batch]))))
    f = np.concatenate(feats, 0).astype(np.float64)
    return f.mean(0), np.cov(f, rowvar=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rundir", default=FIXTURE)
    ap.add_argument("-n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    cfg = cfglib.load_yaml(os.path.join(args.rundir, "config.yaml"))
    ckpt, path = ckptlib.load_run_checkpoint(args.rundir, "sampler", "last",
                                             torch_kind="unet_adm")
    print(f"weights: {path}", flush=True)
    params_np = ckpt["params"]

    inc = InceptionV3FID()
    inc_params = random_fid_inception_params(jax.random.key(0))
    extract = jax.jit(lambda x: inc.apply({"params": inc_params}, x))

    variants = [
        ("einsum_resize_A", dict(attn_impl="einsum", up_impl="resize"), 1),
        ("einsum_resize_B", dict(attn_impl="einsum", up_impl="resize"), 2),
        ("fused_resize_A", dict(attn_impl="fused", up_impl="resize"), 1),
        ("fused_phase_A", dict(attn_impl="fused", up_impl="phase"), 1),
        ("fused_phase_gn_A",
         dict(attn_impl="fused", up_impl="phase", gn="bf16_onepass"), 1),
        ("fused_phase_int8_A",
         dict(attn_impl="fused", up_impl="phase", quant=True), 1),
        ("fused_phase_int8_i8attn_A",
         dict(attn_impl="fused", up_impl="phase", quant=True,
              quant_attn=True), 1),
        ("fused_phase_int8_i8attn_gn_A",
         dict(attn_impl="fused", up_impl="phase", quant=True,
              quant_attn=True, gn="bf16_onepass"), 1),
    ]

    stats = {}
    pixels = {}
    for name, kw, seed in variants:
        # DXMI_GN_STATS is read at TRACE time, so a per-variant env set
        # before the fresh jit selects the GN statistics formulation
        os.environ["DXMI_GN_STATS"] = kw.pop("gn", "fp32")
        sampler = build(cfg, **kw)
        params = jax.tree.map(jnp.asarray, dict(params_np))
        if kw.get("quant"):
            params = sampler.calibrate_quant(params, jax.random.key(42),
                                             n_sample=8, n_rounds=2)
        x01 = generate(sampler, params, jax.random.key(seed), args.n,
                       args.batch)
        stats[name] = feature_stats(extract, x01)
        pixels[name] = x01
        print(f"{name}: generated {len(x01)}", flush=True)

    base = "einsum_resize_A"
    mu0, s0 = stats[base]
    print("\n=== Frechet (random-weight Inception; comparator only) ===")
    for name in stats:
        if name == base:
            continue
        d = stats_lib.frechet_distance(mu0, s0, *stats[name])
        print(f"frechet_random_weights_ {name:28s} {d:.6f}", flush=True)
    print("\n=== matched-seed pixel drift vs einsum_resize_A ===")
    ref = pixels[base]
    for name in pixels:
        if name.endswith("_B") or name == base:
            continue
        rel = (np.abs(pixels[name] - ref).mean()
               / (np.abs(ref).mean() + 1e-8))
        print(f"pixel_drift_ {name:28s} {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
