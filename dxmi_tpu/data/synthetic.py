"""2D synthetic datasets and energies for the paper's 2D experiment
(capability parity with /root/reference/loader/synthetic.py:1-119).

Used by tests and the 2D training entry as a cheap end-to-end substrate.
"""
from __future__ import annotations

import numpy as np


def sample2d(data: str, batch_size: int = 200, rng: np.random.RandomState | None = None,
             scale_factor: float = 1.0) -> np.ndarray:
    """Draw ``batch_size`` samples from a named 2D distribution."""
    if rng is None:
        rng = np.random.RandomState()

    if data == "8gaussians":
        scale = 4.0
        sq2 = 1.0 / np.sqrt(2)
        centers = np.array([
            (1, 0), (-1, 0), (0, 1), (0, -1),
            (sq2, sq2), (-sq2, sq2), (sq2, -sq2), (-sq2, -sq2),
        ]) * scale
        idx = rng.randint(0, 8, size=batch_size)
        points = rng.randn(batch_size, 2) * 0.5 + centers[idx]
        return (points / 1.414).astype(np.float32) * scale_factor

    if data == "2spirals":
        n = np.sqrt(rng.rand(batch_size // 2, 1)) * 540 * (2 * np.pi) / 360
        d1x = -np.cos(n) * n + rng.rand(batch_size // 2, 1) * 0.5
        d1y = np.sin(n) * n + rng.rand(batch_size // 2, 1) * 0.5
        x = np.vstack([np.hstack([d1x, d1y]), np.hstack([-d1x, -d1y])]) / 3
        x += rng.randn(*x.shape) * 0.1
        return x.astype(np.float32) * scale_factor

    if data == "checkerboard":
        x1 = rng.rand(batch_size) * 4 - 2
        x2_ = rng.rand(batch_size) - rng.randint(0, 2, batch_size) * 2
        x2 = x2_ + np.floor(x1) % 2
        out = np.stack([x1, x2], axis=1) * 2
        return out.astype(np.float32) * scale_factor

    raise ValueError(f"unknown 2d dataset: {data}")


def energy2d(data: str, z: np.ndarray) -> np.ndarray:
    """Unnormalised 2D energies U1-U4 (from the normalizing-flows litmus
    suite; reference synthetic.py implements the same four)."""
    z = np.asarray(z, dtype=np.float64)
    z1, z2 = z[:, 0], z[:, 1]

    w1 = np.sin(2 * np.pi * z1 / 4)
    if data == "U1":
        return 0.5 * ((np.linalg.norm(z, axis=1) - 2) / 0.4) ** 2 - np.log(
            np.exp(-0.5 * ((z1 - 2) / 0.6) ** 2)
            + np.exp(-0.5 * ((z1 + 2) / 0.6) ** 2) + 1e-12)
    if data == "U2":
        return 0.5 * ((z2 - w1) / 0.4) ** 2
    if data == "U3":
        w2 = 3 * np.exp(-0.5 * ((z1 - 1) / 0.6) ** 2)
        return -np.log(np.exp(-0.5 * ((z2 - w1) / 0.35) ** 2)
                       + np.exp(-0.5 * ((z2 - w1 + w2) / 0.35) ** 2) + 1e-12)
    if data == "U4":
        w3 = 3 / (1 + np.exp(-(z1 - 1) / 0.3))
        return -np.log(np.exp(-0.5 * ((z2 - w1) / 0.4) ** 2)
                       + np.exp(-0.5 * ((z2 - w1 + w3) / 0.35) ** 2) + 1e-12)
    raise ValueError(f"unknown 2d energy: {data}")


def pdf_8gaussian(x: np.ndarray, scale_factor: float = 1.0) -> np.ndarray:
    """Exact mixture density of the 8gaussians dataset (for evaluating
    sample quality in the 2D experiment)."""
    scale = 4.0
    sq2 = 1.0 / np.sqrt(2)
    centers = np.array([
        (1, 0), (-1, 0), (0, 1), (0, -1),
        (sq2, sq2), (-sq2, sq2), (sq2, -sq2), (-sq2, -sq2),
    ]) * scale
    # forward transform: y = (c + 0.5 eps)/1.414 * scale_factor
    centers = centers / 1.414 * scale_factor
    std = 0.5 / 1.414 * scale_factor
    x = np.asarray(x, dtype=np.float64)[:, None, :]  # (N, 1, 2)
    d2 = ((x - centers[None]) ** 2).sum(-1)
    comp = np.exp(-0.5 * d2 / std**2) / (2 * np.pi * std**2)
    return comp.mean(axis=1)


def structured_class_images(n: int, res: int, n_class: int,
                            seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Class-structured synthetic images in [-1, 1] NHWC + labels.

    Per-class base gradient orientation + a class-colored blob — enough
    label-conditional low-frequency signal that conditional nets can
    LEARN the distribution (the same construction as the round-4 golden
    ADM fixture's ``make_data``, scripts/make_torch_adm_fixture.py, so
    native convergence runs train on the distribution family the torch
    oracle was validated on).  Used by ``train_image_large --fake_data``
    and the Cond convergence recipe (CONVERGENCE.md §7)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / max(res - 1, 1)
    imgs = np.empty((n, res, res, 3), np.float32)
    labels = rng.integers(0, max(n_class, 1), n).astype(np.int32)
    dirs = [(1, 0), (0, 1), (1, 1), (1, -1), (-1, 1), (0, -1), (-1, 0),
            (-1, -1)]
    for i in range(n):
        c = int(labels[i])
        a, b = dirs[c % len(dirs)]
        base = 0.5 + 0.35 * (a * xx + b * yy) / (abs(a) + abs(b))
        cx, cy = rng.uniform(0.25, 0.75, 2)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.03))
        for ch in range(3):
            w = 1.0 if ch == c % 3 else 0.3
            imgs[i, :, :, ch] = np.clip(
                base * rng.uniform(0.6, 1.0) + w * 0.5 * blob
                + rng.normal(0, 0.02, (res, res)), 0, 1)
    return 2.0 * imgs - 1.0, labels
