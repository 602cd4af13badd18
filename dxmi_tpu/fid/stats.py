"""Activation statistics and Frechet distance.

Math parity with /root/reference/pytorch_fid/fid_score.py:224-364:
mean/cov of 2048-d pool3 activations, Frechet distance via matrix sqrt
with the same eps-jitter fallback and imaginary-component check.

TPU-native note: on-device the matrix sqrt can run as a Newton-Schulz
iteration in fp32 (``sqrtm_newton_schulz``); the scipy path reproduces the
reference bit-for-bit on host.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) activations -> (mu (D,), sigma (D, D)) with ddof=1 covariance
    (np.cov default, matching fid_score.py:164-166)."""
    acts = np.asarray(acts, dtype=np.float64)
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def sharded_moments(acts_global) -> Tuple[int, np.ndarray, np.ndarray]:
    """Global activation moment sums from a (possibly cross-process)
    data-sharded jax.Array (N, D): returns (n, s1 (D,), s2 (D, D)) on
    host, replicated — XLA/GSPMD inserts the cross-device reductions
    (the TPU-native replacement for the reference's per-rank all_gather
    FID flow, /root/reference/train_image_large.py:50-69: instead of
    gathering raw activations to rank 0, only the O(D^2) moment sums
    cross the ICI)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def mom(a):
        a32 = a.astype(jnp.float32)
        return a32.sum(0), a32.T @ a32

    s1, s2 = mom(acts_global)
    return (int(acts_global.shape[0]), np.asarray(s1, np.float64),
            np.asarray(s2, np.float64))


def stats_from_moments(n: int, s1: np.ndarray,
                       s2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n, Σx, Σxxᵀ) -> (mu, ddof=1 covariance), matching
    activation_statistics up to the one-pass reassociation."""
    mu = s1 / n
    sigma = (s2 - n * np.outer(mu, mu)) / (n - 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     method: str = "auto") -> float:
    """Frechet distance between two Gaussians (fid_score.py:224-278).

    ``method``:
      * ``'scipy'`` — the reference's complex-Schur ``linalg.sqrtm``
        (bit-parity with pytorch_fid; ~14 s at 2048² on this host).
      * ``'cholesky'`` — exact reformulation: with Σ₁ = LLᵀ,
        Σ₁Σ₂ is similar to the SPD matrix LᵀΣ₂L, so
        tr √(Σ₁Σ₂) = Σᵢ √λᵢ(LᵀΣ₂L) via one Cholesky + eigvalsh
        (~3 s; differs from scipy only in float64 rounding, see
        tests/test_fid.py).
      * ``'auto'`` — cholesky when Σ₁ is positive definite, scipy
        fallback otherwise (degenerate/singular stats keep the
        reference's eps-jitter semantics).
    """
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    if method in ("auto", "cholesky"):
        try:
            L = np.linalg.cholesky(sigma1)
            inner = L.T @ sigma2 @ L
            vals = np.linalg.eigvalsh((inner + inner.T) / 2.0)
            tr_covmean = float(np.sqrt(np.clip(vals, 0.0, None)).sum())
            return float(diff.dot(diff) + np.trace(sigma1)
                         + np.trace(sigma2) - 2.0 * tr_covmean)
        except np.linalg.LinAlgError:
            if method == "cholesky":
                raise
            # singular Σ₁ -> reference path below (eps-jitter semantics)

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def sqrtm_newton_schulz(a: np.ndarray, iters: int = 50):
    """Matrix square root by Newton-Schulz iteration — runs well on the MXU
    (pure matmuls) for on-device FID; float64 on host for testing."""
    import jax.numpy as jnp

    a = jnp.asarray(a)
    dim = a.shape[0]
    norm = jnp.linalg.norm(a)
    y = a / norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)
    for _ in range(iters):
        t = 0.5 * (eye3 - z @ y)
        y = y @ t
        z = t @ z
    return y * jnp.sqrt(norm)
