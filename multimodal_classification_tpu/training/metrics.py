"""Evaluation metrics, computed host-side in numpy.

Same metric set as the reference's ``_evaluate`` (nodes.py:907-930): loss,
accuracy, AUROC from P(class 1), binary F1 — plus precision/recall/confusion
(README.md:263-264). AUROC is the exact rank statistic (Mann-Whitney U with
tie correction), numerically identical to sklearn.roc_auc_score; sklearn is
used only as a cross-check in tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """AUROC via the rank-sum formulation with midrank ties."""
    labels = np.asarray(labels).astype(np.int64)
    scores = np.asarray(scores).astype(np.float64)
    n_pos = int((labels == 1).sum())
    n_neg = int((labels == 0).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    sorted_scores = scores[order]
    ranks = np.empty_like(sorted_scores)
    i = 0
    n = len(sorted_scores)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[i : j + 1] = 0.5 * (i + j) + 1.0  # midrank (1-based)
        i = j + 1
    rank_of = np.empty(n)
    rank_of[order] = ranks
    sum_pos_ranks = rank_of[labels == 1].sum()
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def binary_metrics(
    labels: np.ndarray,
    probs_pos: np.ndarray,
    loss: Optional[float] = None,
    threshold: float = 0.5,
) -> Dict[str, float]:
    """accuracy / auroc / f1 / precision / recall / confusion counts."""
    labels = np.asarray(labels).astype(np.int64)
    preds = (np.asarray(probs_pos) >= threshold).astype(np.int64)
    tp = int(((preds == 1) & (labels == 1)).sum())
    tn = int(((preds == 0) & (labels == 0)).sum())
    fp = int(((preds == 1) & (labels == 0)).sum())
    fn = int(((preds == 0) & (labels == 1)).sum())
    acc = (tp + tn) / max(len(labels), 1)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    out = {
        "accuracy": float(acc),
        "auroc": auroc(labels, probs_pos),
        "f1": float(f1),
        "precision": float(precision),
        "recall": float(recall),
        "tp": tp, "tn": tn, "fp": fp, "fn": fn,
    }
    if loss is not None:
        out["loss"] = float(loss)
    return out
