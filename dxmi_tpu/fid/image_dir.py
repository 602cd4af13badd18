"""Activation extraction from an image directory (the pytorch_fid
``ImagePathDataset`` path, fid_score.py:108-167) and dataset-statistic
precompute/caching (fid_score.py:344-430)."""
from __future__ import annotations

import os
from typing import Callable, List, Tuple

import numpy as np


IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".webp"}


def list_images(path: str) -> List[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in IMG_EXTS:
                out.append(os.path.join(root, f))
    return sorted(out)


def load_batch(paths: List[str]) -> np.ndarray:
    from PIL import Image

    imgs = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) / 255.0
        imgs.append(img)
    return np.stack(imgs)  # (B, H, W, 3) in [0, 1]


def dir_activations(path: str, extract_fn: Callable, batch: int = 50) -> np.ndarray:
    """Run the pool3 extractor over every image in ``path``."""
    files = list_images(path)
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    acts = []
    for i in range(0, len(files), batch):
        chunk = files[i:i + batch]
        x = load_batch(chunk)
        acts.append(np.asarray(extract_fn(x)))
    return np.concatenate(acts)


def compute_dir_statistics(path: str, extract_fn: Callable, batch: int = 50
                           ) -> Tuple[np.ndarray, np.ndarray]:
    from dxmi_tpu.fid.stats import activation_statistics

    return activation_statistics(dir_activations(path, extract_fn, batch))


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    np.savez(path, mu=mu, sigma=sigma)
