"""Convert published PyTorch DxMI checkpoints to dxmi_tpu msgpack params.

    python scripts/convert_checkpoint.py --kind unet_small \
        pretrained/cifar10_ddpm/model.ckpt.pth out/sampler_net.msgpack
    python scripts/convert_checkpoint.py --kind unet_adm \
        pretrained/imagenet64_edm/edm_imagenet64_ema.pt out/edm.msgpack
    python scripts/convert_checkpoint.py --kind igebm \
        results/.../value_best.pth out/value.msgpack
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["unet_small", "unet_adm", "igebm", "value"])
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()

    from dxmi_tpu.utils import checkpoint as C
    from dxmi_tpu.utils import convert

    state = C.load_torch_checkpoint(args.src)
    meta = state.pop("__meta__", {})

    if args.kind == "unet_small":
        out = convert.convert_unet_small(state)
    elif args.kind == "unet_adm":
        out = convert.convert_unet_adm(state)
    elif args.kind == "igebm":
        out = convert.convert_igebm(state)
    else:  # value = TimeIndependentValue(IGEBM)
        out = convert.wrap_value_params(convert.convert_igebm(state))

    params = out["params"]
    if "log_betas" in out:
        params = {"net": params, "log_betas": out["log_betas"]}
    # spectral-norm checkpoints carry a 'sn_stats' collection (power-
    # iteration u/sigma) — keep it in the artifact or the SN net can't run
    extra = {"sn_stats": out["sn_stats"]} if "sn_stats" in out else None
    C.save_checkpoint(args.dst, params,
                      meta={k: v for k, v in meta.items()
                            if isinstance(v, (int, float, str))},
                      extra=extra)
    print(f"converted {args.src} ({args.kind}) -> {args.dst}"
          + (" [sn_stats kept]" if extra else ""))


if __name__ == "__main__":
    main()
