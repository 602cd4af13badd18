"""Anomaly-detection metrics (capability parity with the reference's
AUROC/AUPR helpers, /root/reference/utils.py:31-36, 205-243) plus small
self-contained implementations so sklearn stays optional."""
from __future__ import annotations

import numpy as np


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """AUROC via the rank statistic (equivalent to sklearn's
    roc_auc_score for binary labels)."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("need both classes for AUROC")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    # average ranks for ties
    sorted_scores = scores[order]
    ranks[order] = np.arange(1, len(scores) + 1)
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """AUPR (average precision)."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels).astype(bool)
    order = np.argsort(-scores, kind="mergesort")
    labels = labels[order]
    tp = np.cumsum(labels)
    precision = tp / np.arange(1, len(labels) + 1)
    n_pos = labels.sum()
    if n_pos == 0:
        raise ValueError("no positives")
    return float((precision * labels).sum() / n_pos)


def anomaly_scores_from_energy(energies_in: np.ndarray,
                               energies_out: np.ndarray) -> dict:
    """Score OOD detection where higher energy = more anomalous."""
    scores = np.concatenate([energies_in, energies_out])
    labels = np.concatenate([np.zeros(len(energies_in)),
                             np.ones(len(energies_out))])
    return {
        "auroc": roc_auc(scores, labels),
        "aupr": average_precision(scores, labels),
    }
