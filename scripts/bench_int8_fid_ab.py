"""Distribution-level int8 quality gate (VERDICT r1 #2a/#8).

Measures the Frechet distance between fp(bf16) and int8-static sample
distributions from the SAME trained checkpoint, against the fp-vs-fp
different-seed noise floor. A distribution metric (what FID is), not a
pixel-drift probe — the round-1 gap.

Comparator: the Flax FID InceptionV3 pool3 features. With no real
Inception weights in this container the features are random-init
(printed banner); a fixed random projection of this depth is a valid
*consistent comparator* for same-architecture A/Bs (both sample sets go
through identical features), while absolute values are NOT FID numbers.

Usage (real chip):
    python scripts/bench_int8_fid_ab.py --log_dir <run dir> [-n 8192]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp


def sample_np(sampler, params, key, n, batch, desc, gn_stats="fp32"):
    """GN stats mode is read at TRACE time — scope the env var around the
    jit call so each arm compiles with its own formulation."""
    from dxmi_tpu.samplers import sample_many

    assert n % batch == 0
    os.environ["DXMI_GN_STATS"] = gn_stats
    try:
        imgs = jax.jit(lambda k: sample_many(sampler, params, k, n // batch,
                                             batch))(key)
        x = np.asarray(imgs).reshape(n, *imgs.shape[2:])
    finally:
        os.environ.pop("DXMI_GN_STATS", None)
    print(f"{desc}: {x.shape} range [{x.min():.3f},{x.max():.3f}]",
          flush=True)
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("-n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--which", default="best")
    args = ap.parse_args()

    from dxmi_tpu import config as cfglib
    from dxmi_tpu.config import instantiate
    from dxmi_tpu.fid.stats import activation_statistics, frechet_distance
    from dxmi_tpu.utils import checkpoint as ckptlib
    from evaluations.evaluator import build_extractors

    cfg = cfglib.load_yaml(os.path.join(args.log_dir, "config.yaml"))
    target = str(cfg["sampler_net"].get("_target_", "")).lower()
    torch_kind = "unet_small" if "unet_small" in target else None
    ckpt, path = ckptlib.load_run_checkpoint(args.log_dir, "sampler",
                                             args.which,
                                             torch_kind=torch_kind)
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    print(f"loaded {path}")

    def build(quant):
        # int8 arm = the EXACT bench.py config: static W8A8 +
        # quant_skip_attn + bf16_onepass GN stats (scripts/bench_gn_stats.py)
        kw = ({"quant_int8": "static", "quant_skip_attn": True}
              if quant else {})
        net = instantiate(cfg["sampler_net"], dtype=jnp.bfloat16,
                          softmax_f32=False, **kw)
        sampler = instantiate(cfg["sampler"], net=net)
        p = params
        if "log_betas" not in p:
            p = {**sampler.init_params(jax.random.key(0)), **p}
        if quant:
            p = sampler.calibrate_quant(p, jax.random.key(77))
        return sampler, p

    s_fp, p_fp = build(False)
    s_q, p_q = build(True)

    extract = build_extractors(weights_path=None, batch=100)

    def feats(x01):
        fs = []
        for i in range(0, len(x01), 100):
            fs.append(extract(x01[i:i + 100])["pool3"])
        return np.concatenate(fs)

    ka, kb = jax.random.key(1), jax.random.key(2)
    sets = {
        "fp_seedA": sample_np(s_fp, p_fp, ka, args.n, args.batch, "fp A"),
        "fp_seedB": sample_np(s_fp, p_fp, kb, args.n, args.batch, "fp B"),
        "int8_seedA": sample_np(s_q, p_q, ka, args.n, args.batch,
                                "int8+bf16_onepass A",
                                gn_stats="bf16_onepass"),
    }
    stats = {k: activation_statistics(feats(v)) for k, v in sets.items()}

    floor = frechet_distance(*stats["fp_seedA"], *stats["fp_seedB"])
    d_q = frechet_distance(*stats["fp_seedB"], *stats["int8_seedA"])
    d_q_same = frechet_distance(*stats["fp_seedA"], *stats["int8_seedA"])
    print(f"n={args.n}  Frechet(fp_A, fp_B)   = {floor:.4f}  (seed noise floor)")
    print(f"n={args.n}  Frechet(fp_B, int8_A) = {d_q:.4f}  "
          f"({d_q/max(floor,1e-9):.2f}x floor)")
    print(f"n={args.n}  Frechet(fp_A, int8_A) = {d_q_same:.4f}  (same seed)")
    # pixel drift for continuity with earlier probes
    drift = np.mean(np.abs(sets["int8_seedA"] - sets["fp_seedA"])) / max(
        np.mean(np.abs(sets["fp_seedA"])), 1e-9)
    print(f"same-seed pixel drift = {drift*100:.2f}%")


if __name__ == "__main__":
    main()
