"""Torch tensor-file datasets (the reference README's MVTec layout:
``datasets/mvtec/{train_data,val_data}.pth`` — README.md "Datasets").

The reference snapshot ships NO code that reads these files (anomaly
detection is marked TODO, README.md:45-46); this loader makes the
documented dataset layout directly usable by ``train_anomaly.py``.
Accepts a saved tensor, a (data, labels) tuple/list, or a dict with a
tensor under a common key; images are normalized to NHWC float32 in
[-1, 1] from [0,255] / [0,1] / [-1,1] inputs (range inferred).
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


def _to_nhwc_pm1(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float32)
    if arr.ndim != 4:
        raise ValueError(f"expected a 4-D image tensor, got {arr.shape}")
    if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = arr.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    amax, amin = float(arr.max()), float(arr.min())
    if amax > 1.5:          # [0, 255]
        arr = arr / 127.5 - 1.0
    elif amin >= 0.0:       # [0, 1]
        arr = arr * 2.0 - 1.0
    return arr              # already [-1, 1]


def load_tensor_dataset(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """-> (images NHWC float32 in [-1,1], labels or None)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    labels = None
    if isinstance(obj, (tuple, list)) and len(obj) >= 1:
        if len(obj) >= 2 and hasattr(obj[1], "shape"):
            labels = np.asarray(obj[1])
        obj = obj[0]
    elif isinstance(obj, dict):
        for k in ("data", "images", "x", "train_data"):
            if k in obj:
                if "labels" in obj and hasattr(obj["labels"], "shape"):
                    labels = np.asarray(obj["labels"])
                elif "y" in obj and hasattr(obj["y"], "shape"):
                    labels = np.asarray(obj["y"])
                obj = obj[k]
                break
        else:
            obj = next(v for v in obj.values() if hasattr(v, "shape"))
    if hasattr(obj, "numpy"):
        obj = obj.numpy()
    return _to_nhwc_pm1(np.asarray(obj)), labels


def tensor_batches(path: str, batch_size: int, seed: int = 0,
                   image_size: Optional[int] = None
                   ) -> Iterator[Tuple[np.ndarray, dict]]:
    """Infinite shuffled batch generator over a tensor file (same yield
    contract as image_folder.load_data)."""
    imgs, labels = load_tensor_dataset(path)
    if image_size is not None and imgs.shape[1] != image_size:
        raise ValueError(
            f"{path} holds {imgs.shape[1]}x{imgs.shape[2]} images; set "
            f"--image_size {imgs.shape[1]} (got {image_size})")
    rng = np.random.RandomState(seed)
    n = len(imgs)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            extra = {}
            if labels is not None:
                extra["y"] = np.asarray(labels[idx], np.int32)
            yield imgs[idx], extra
