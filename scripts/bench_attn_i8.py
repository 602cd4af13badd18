"""int8-native fused attention A/B at the recorded round-3 operating
points (PERF.md: ImageNet64 int8+fused+phase b32 = 78.99 img/s, LSUN-256
= 17.54): the only change between variants is whether the fused
attention kernel runs its qkv/proj matmuls W8A8 in-kernel
(ops/attn_block.fused_attn_block_int8) or bf16 (the round-3 default).

    python scripts/bench_attn_i8.py imagenet64_bf16attn
    python scripts/bench_attn_i8.py imagenet64_i8attn
    python scripts/bench_attn_i8.py lsun_bf16attn
    python scripts/bench_attn_i8.py lsun_i8attn
    python scripts/bench_attn_i8.py imagenet64_i8attn_b48   # batch probe

One variant per process (serialized-dispatch, host-fetch close — the
bench_adm_phase.py methodology, same warmup/reps).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401

import jax
import jax.numpy as jnp

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "imagenet64_i8attn"

CFGS = {
    "imagenet64": dict(
        cfg=dict(sigma_min=0.002, sigma_max=80.0, image_size=64,
                 num_channels=192, num_res_blocks=3, num_heads=4,
                 num_heads_upsample=-1, num_head_channels=64,
                 attention_resolutions="32,16,8", channel_mult="",
                 dropout=0.0, class_cond=True, use_checkpoint=False,
                 use_scale_shift_norm=True, resblock_updown=True,
                 use_fp16=True, attn_impl="fused", quant_int8="static",
                 up_impl="phase"),
        shape=(3, 64, 64), batch=32, nb=8, reps=2, classes=1000),
    "lsun": dict(
        cfg=dict(sigma_min=0.002, sigma_max=80.0, image_size=256,
                 num_channels=256, num_res_blocks=3, num_heads=4,
                 num_heads_upsample=-1, num_head_channels=64,
                 attention_resolutions="32,16,8", channel_mult="",
                 dropout=0.0, class_cond=False, use_checkpoint=False,
                 use_scale_shift_norm=True, resblock_updown=True,
                 use_fp16=True, attn_impl="fused", quant_int8="static",
                 up_impl="phase"),
        shape=(3, 256, 256), batch=16, nb=4, reps=2, classes=0,
        T=4),
}


def main():
    from dxmi_tpu.models import unet_adm as adm
    from dxmi_tpu.samplers import sample_many
    from dxmi_tpu.samplers.edm import EDMSampler

    parts = VARIANT.split("_")
    family, mode = parts[0], parts[1]
    spec = CFGS[family]
    batch = spec["batch"]
    for p in parts[2:]:
        if p.startswith("b"):
            batch = int(p[1:])
    quant_attn = "static" if mode == "i8attn" else False
    cfgd = dict(spec["cfg"])
    if mode == "flash":
        cfgd["attn_impl"] = "flash"
        quant_attn = False
    net, diffusion = adm.create_model_and_diffusion(
        **cfgd, quant_attn=quant_attn)
    s = EDMSampler(net, diffusion, sample_shape=spec["shape"],
                   n_timesteps=spec.get("T", 10),
                   class_cond=spec["classes"] > 0,
                   num_classes=spec["classes"], trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    params = s.calibrate_quant(params, jax.random.key(3), n_sample=4,
                               n_rounds=1)
    B, NB, reps = batch, spec["nb"], spec["reps"]

    def prog(p, k):
        out = sample_many(s, p, k, NB, B)
        return out, out[0, 0, 0, 0, 0].astype(jnp.float32)

    gen = jax.jit(prog)
    print(f"[{time.strftime('%H:%M:%S')}] {VARIANT}: compiling...",
          flush=True)
    out, scal = gen(params, jax.random.key(1))
    float(scal)
    for i in range(2):
        out, scal = gen(params, jax.random.fold_in(jax.random.key(1), i))
    float(scal)
    ks = [jax.random.fold_in(jax.random.key(2), i) for i in range(reps)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for k in ks:
        out, scal = gen(params, k)
    float(scal)
    dt = time.perf_counter() - t0
    print(f"{VARIANT:30s} {B*NB*reps/dt:7.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
