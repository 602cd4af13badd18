"""Benchmark: CIFAR-10 T=10 sampling throughput on the flagship DDPM U-Net.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N/2000}

Baseline: BASELINE.md north-star — >= 2,000 images/sec/chip sampling
(CIFAR T=10) on TPU v5e. The reference publishes no throughput numbers
(SURVEY.md §6), so the driver-set target is the denominator.

Measured path (round 3): static W8A8 int8 convs (per-input-channel
scales) with attention 1x1s kept bf16 (quant_skip_attn), the merged
(C,3C) qkv matmul (attn_impl='einsum_merged', exact numerics),
bf16-read/fp32-accumulate GroupNorm statistics (DXMI_GN_STATS=
bf16_onepass), no-max-pass softmax (softmax_nomax, exact math), and
the phase-decomposed decoder upsample (up_impl='phase', exact algebra
— ops/phase_up.py). Quality gate (PERF.md round-3 gate table,
scripts/bench_int8_quality.py --bench_path on trained golden-fixture
weights): this exact path's Frechet distance to the fp path sits far
below the same-weights reseed floor.

Measurement shape mirrors production bulk generation: a lax.scan over
whole trajectories inside one dispatch (dxmi_tpu.samplers.sample_many),
params closed over as jit constants (fixed checkpoint), so
host/dispatch latency is amortized exactly as it is when generating 50k
FID samples.
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: first compile of the scanned U-Net is slow
# over the remote-compile tunnel; later runs hit the cache
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# GN statistics formulation for the measured path (see PERF.md GN-stats
# matrix): bf16 reads, fp32 s1/s2 accumulation. Set before model import.
os.environ.setdefault("DXMI_GN_STATS", "bf16_onepass")

import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 2000.0


def main():
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.var import VARSampler

    # measured optimum on v5e (PERF.md batch sweep at the int8 point):
    # batch 96 saturates; 96x64 edges 96x48 (1968 vs 1967 merged). Params
    # are closed over as jit CONSTANTS — the production bulk-generation
    # shape (fixed checkpoint), which lets XLA pre-layout weights and
    # fold casts.
    batch = 96
    n_batches = 64

    net = UNetSmall(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                    attn_resolutions=(16,), dropout=0.0, in_channels=3,
                    resolution=32, dtype=jnp.bfloat16, softmax_f32=False,
                    quant_int8="static", quant_skip_attn=True,
                    attn_impl="einsum_merged", softmax_nomax=True,
                    up_impl="phase")
    sampler = VARSampler(net, n_timesteps=10, sample_shape=(3, 32, 32),
                         trainable_beta="fix_last")
    params = sampler.init_params(jax.random.key(0))
    # static int8 activation scales from a short calibration pass
    # (percentile q=0.995; PERF.md calibration sweep)
    params = sampler.calibrate_quant(params, jax.random.key(3),
                                     n_sample=8, n_rounds=1)

    def prog(k):
        out = sample_many(sampler, params, k, n_batches, batch)
        # scalar witness: fetching it to host closes the timing window
        # honestly (PERF.md round-3 window hardening — block_until_ready
        # was verified NOT to return early here, 1969.9 vs 1969.6, but
        # the fetch makes the number unimpeachable by construction)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)

    # warmup / compile, then a discarded window: steady-state throughput
    # arrives ~5 dispatches in (clock/pipeline ramp; PERF.md methodology)
    key = jax.random.key(1)
    out, scal = gen(key)
    float(scal)
    for i in range(4):
        out, scal = gen(jax.random.key(2 + i))
    float(scal)

    reps = 8  # r3: the longer window amortizes the close (+0.2%)
    rep_keys = [jax.random.fold_in(key, 100 + i) for i in range(reps)]
    jax.block_until_ready(rep_keys)
    t0 = time.perf_counter()
    for k in rep_keys:
        out, scal = gen(k)
    float(scal)  # host fetch of the witness closes the window
    dt = time.perf_counter() - t0

    images_per_sec = batch * n_batches * reps / dt
    per_chip = images_per_sec / jax.device_count()
    print(json.dumps({
        "metric": "cifar10_t10_sampling_throughput_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec",
        "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
