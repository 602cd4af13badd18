"""Quality gate for the DDGAN sampling defaults on TRAINED native
weights (round 5, VERDICT r4 Missing #2 / task 4).

Round-4's ~3,460-3,515 img/s DDGAN headline (bf16 torso + int8 static
skip_attn) rested on random-weight drift tests only; rounds 1-3 showed
trained weights behave materially differently (pixel drift 4.5% random
-> 0.52% trained on the CIFAR UNetSmall).  This script runs the gate
protocol from scripts/bench_adm_quality.py on the trained NATIVE DDGAN
fixture (tests/fixtures/native_rundir_ddgan_t4 — the reference snapshot
ships no DDGAN module, SURVEY.md §2.0, so the native
``value_resample: true`` trainer IS the oracle; reference experiment
definition /root/reference/configs/cifar10/T4_ddgan.yaml:2-9):

  fp32 seed A/B      -> Frechet(fpA, fpB) = sampling-noise FLOOR
  bf16               -> bf16 compute torso (params fp32)
  int8               -> W8A8 static convs incl. attention 1x1s
  int8_skip_attn     -> W8A8 static, attention 1x1s stay fp/bf16
  bf16_int8_skip     -> the round-4 headline stack

Features: Flax FID InceptionV3 with RANDOM weights (fixed seed 0) — a
CONSISTENT COMPARATOR ONLY (zero-egress container); plus matched-seed
pixel drift vs the fp32 trajectory.

Run (chip): python scripts/bench_ddgan_quality.py [--rundir DIR] [-n 2048]
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
from dxmi_tpu.config import instantiate
from dxmi_tpu.fid import stats as stats_lib
from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params
from dxmi_tpu.models.ncsnpp import NCSNpp, NCSNppArgs
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.samplers.ddgan import DDGANSampler
from dxmi_tpu.utils import checkpoint as ckptlib

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "tests", "fixtures", "native_rundir_ddgan_t4")


def build(cfg, *, dtype=jnp.float32, quant=False, skip_attn=False):
    net = NCSNpp(config=NCSNppArgs(), dtype=dtype,
                 quant_int8=("static" if quant else False),
                 quant_skip_attn=skip_attn)
    scfg = dict(cfg["sampler"])
    scfg.pop("_target_", None)
    return DDGANSampler(net, **scfg)


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
    ap.add_argument("--sampler", default="best", choices=["best", "last"])
    ap.add_argument("-n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    cfg = cfglib.load_yaml(os.path.join(args.rundir, "config.yaml"))
    base_net = instantiate(cfg["sampler_net"])
    base_sampler = instantiate(cfg["sampler"], net=base_net)
    params0 = base_sampler.init_params(jax.random.key(0))
    path = os.path.join(args.rundir, f"sampler_{args.sampler}.msgpack")
    params_np = ckptlib.load_sampler_params(path, current=params0)
    print(f"weights: {path}", flush=True)

    inc = InceptionV3FID()
    inc_params = random_fid_inception_params(jax.random.key(0))
    extract = jax.jit(lambda x: inc.apply({"params": inc_params}, x))

    variants = [
        ("fp32_A", dict(), 1),
        ("fp32_B", dict(), 2),
        ("bf16_A", dict(dtype=jnp.bfloat16), 1),
        ("int8_A", dict(quant=True), 1),
        ("int8_skip_attn_A", dict(quant=True, skip_attn=True), 1),
        ("bf16_int8_skip_A",
         dict(dtype=jnp.bfloat16, quant=True, skip_attn=True), 1),
    ]

    stats, pixels = {}, {}
    for name, kw, seed in variants:
        sampler = build(cfg, **kw)
        params = jax.tree.map(jnp.asarray, dict(params_np))
        if kw.get("quant"):
            params = sampler.calibrate_quant(params, jax.random.key(42),
                                             n_sample=64, n_rounds=2)
        x01 = generate(sampler, params, jax.random.key(seed), args.n,
                       args.batch)
        stats[name] = feature_stats(extract, x01)
        pixels[name] = x01
        print(f"{name}: generated {len(x01)}", flush=True)

    base = "fp32_A"
    mu0, s0 = stats[base]
    print("\n=== Frechet (random-weight Inception; comparator only) ===")
    for name in stats:
        if name == base:
            continue
        d = stats_lib.frechet_distance(mu0, s0, *stats[name])
        print(f"frechet_random_weights_ {name:20s} {d:.6f}", flush=True)
    print("\n=== matched-seed pixel drift vs fp32_A ===")
    ref = pixels[base]
    for name in pixels:
        if name.endswith("_B") or name == base:
            continue
        rel = (np.abs(pixels[name] - ref).mean()
               / (np.abs(ref).mean() + 1e-8))
        print(f"pixel_drift_ {name:20s} {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
