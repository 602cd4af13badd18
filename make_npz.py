"""Pack a directory of generated PNGs into the npz format consumed by the
offline evaluator (the reference README references a make_npz.py that is
absent from the snapshot, README.md:163 — reconstructed here).

    python make_npz.py --image_dir results/.../generated_best --out samples.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", "--image_dir", dest="image_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1024)
    args = p.parse_args()

    from dxmi_tpu.fid.image_dir import list_images

    from PIL import Image

    files = list_images(args.image_dir)
    if not files:
        raise SystemExit(f"no images under {args.image_dir}")
    arrs = []
    for f in files:
        arrs.append(np.asarray(Image.open(f).convert("RGB"), dtype=np.uint8))
    arr = np.stack(arrs)
    np.savez(args.out, arr_0=arr)
    print(f"packed {len(arr)} images {arr.shape[1:]} -> {args.out}")


if __name__ == "__main__":
    main()
