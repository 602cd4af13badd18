"""FID-level quality gate for the int8 sampling path on TRAINED weights.

VERDICT r1 #2a/#8: all prior int8 drift numbers were pixel-space probes on
random weights; this connects the bench path (static W8A8 + quant_skip_attn
+ DXMI_GN_STATS=bf16_onepass) to a distribution-level metric on genuinely
trained parameters.

Protocol (per weight source):
  fpA   = samples from the fp bf16 path, seed A
  fpB   = samples from the fp bf16 path, seed B   -> Frechet(fpA, fpB) is
          the sampling-noise FLOOR at this sample count
  int8A = samples from the bench int8 path, seed A
  fusedA= samples with attn_impl='fused' (fp), seed A (VERDICT #8 asks for
          the fused-attn number too)
Features: Flax FID InceptionV3 with RANDOM weights (fixed seed 0). The
container has no trained Inception weights (zero egress), so these numbers
are a CONSISTENT COMPARATOR ONLY — not comparable to published FID. Every
line is tagged frechet_random_weights_ accordingly.

Weight sources:
  --rundir tests/fixtures/torch_rundir_t10   (default) committed golden
      torch run dir — reference trainer, 150 steps, ch=32 16x16 net.
  --rundir <dxmi run dir>  a run dir written by train_cifar10.py (e.g. a
      TPU --fake_data run of the bench-shape ch=128 net); loads the
      'last' sampler checkpoint.

Run: python scripts/bench_int8_quality.py [--rundir DIR] [-n 4096]
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
from dxmi_tpu.samplers import sample_many
from dxmi_tpu.utils import checkpoint as ckptlib


def load_trained(rundir):
    """(cfg, params_np) from either a torch reference run dir or ours."""
    cfg = cfglib.load_yaml(os.path.join(rundir, "config.yaml"))
    is_torch = os.path.exists(os.path.join(rundir, "sampler_best.pth"))
    kind = "unet_small"
    which = "best" if is_torch else "last"
    ckpt, path = ckptlib.load_run_checkpoint(rundir, "sampler", which,
                                             torch_kind=kind)
    print(f"weights: {path}")
    return cfg, ckpt["params"]


def build_sampler(cfg, *, quant=False, attn_impl=None, **extra):
    kw = dict(dtype=jnp.bfloat16, softmax_f32=False, **extra)
    if quant:
        kw["quant_int8"] = "static"
    if attn_impl:
        kw["attn_impl"] = attn_impl
    net = instantiate(cfg["sampler_net"], **kw)
    return instantiate(cfg["sampler"], net=net)


def generate(sampler, params, key, n, batch):
    nb = (n + batch - 1) // batch
    fn = jax.jit(lambda k: sample_many(sampler, params, k, nb, batch))
    xs = np.asarray(fn(key))           # (nb, batch, H, W, C) in [-1, 1]
    xs = xs.reshape(-1, *xs.shape[2:])[:n]
    return np.clip((xs + 1.0) / 2.0, 0.0, 1.0).astype(np.float32)


def feature_stats(extract, x01, batch=64):
    acts = []
    for i in range(0, len(x01), batch):
        chunk = x01[i:i + batch]
        if len(chunk) < batch:  # keep one compiled shape
            pad = np.concatenate([chunk, np.zeros(
                (batch - len(chunk), *chunk.shape[1:]), chunk.dtype)])
            acts.append(np.asarray(extract(pad))[:len(chunk)])
        else:
            acts.append(np.asarray(extract(chunk)))
    return stats_lib.activation_statistics(np.concatenate(acts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rundir", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "torch_rundir_t10"))
    ap.add_argument("-n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip_fused", action="store_true")
    ap.add_argument("--bench_path", action="store_true",
                    help="also gate the exact round-3 bench.py config "
                         "(merged qkv + skip-attn + nomax, resize & "
                         "phase upsample)")
    args = ap.parse_args()

    print("=" * 72)
    print("NOT REAL FID: random-weight Inception comparator "
          "(no trained Inception in this container). Metric name: "
          "frechet_random_weights_*. Relative comparisons only.")
    print("=" * 72)

    cfg, params_np = load_trained(args.rundir)
    params = jax.tree.map(jnp.asarray, params_np)

    fp = build_sampler(cfg)
    kA, kB, kC = (jax.random.key(s) for s in (1001, 2002, 3003))

    fpA = generate(fp, params, kA, args.n, args.batch)
    fpB = generate(fp, params, kB, args.n, args.batch)
    print(f"fp samples: {fpA.shape}  mean {fpA.mean():.4f}")

    os.environ["DXMI_GN_STATS"] = "bf16_onepass"
    try:
        q = build_sampler(cfg, quant=True)
        qp = q.calibrate_quant(params, kC, n_sample=8, n_rounds=1)
        intA = generate(q, qp, kA, args.n, args.batch)
        sets_extra = {}
        if args.bench_path:
            # the EXACT round-3 bench.py configuration: merged qkv,
            # attention kept bf16, nomax softmax (+ phase upsample A/B)
            for name, up in (("bench_r3", "resize"),
                             ("bench_r3_phase", "phase")):
                qb = build_sampler(cfg, quant=True,
                                   attn_impl="einsum_merged",
                                   quant_skip_attn=True,
                                   softmax_nomax=True, up_impl=up)
                qbp = qb.calibrate_quant(params, kC, n_sample=8,
                                         n_rounds=1)
                sets_extra[name] = generate(qb, qbp, kA, args.n,
                                            args.batch)
    finally:
        os.environ.pop("DXMI_GN_STATS", None)
    print(f"int8 samples: mean {intA.mean():.4f}  "
          f"pixel drift {np.abs(intA - fpA).mean() / (fpA.std() + 1e-8):.4f}")

    sets = {"fpB_floor": fpB, "int8_bench_path": intA, **sets_extra}
    if not args.skip_fused:
        try:
            fused = build_sampler(cfg, attn_impl="fused")
            sets["fused_attn"] = generate(fused, params, kA, args.n,
                                          args.batch)
        except Exception as e:  # fused gate may reject tiny shapes
            print(f"fused-attn skipped: {e}")

    model = InceptionV3FID()
    iparams = random_fid_inception_params(jax.random.key(0))
    extract = jax.jit(lambda x: model.apply({"params": iparams}, x))

    mA, sA = feature_stats(extract, fpA)
    mB, sB = feature_stats(extract, sets["fpB_floor"])
    for name, x in sets.items():
        m, s = feature_stats(extract, x)
        dA = stats_lib.frechet_distance(mA, sA, m, s)
        # vs fpB (cross-seed control): a quantized path with NO
        # distribution shift should land at the fpA-vs-fpB floor
        dB = stats_lib.frechet_distance(mB, sB, m, s)
        print(f"frechet_random_weights_{name:18s} vs fpA: {dA:10.4f}"
              f"   vs fpB: {dB:10.4f}")


if __name__ == "__main__":
    main()
