"""Multi-label probe metrics: per-class AUPR and Fmax (+ dict merge util).

Native equivalents of cstp_v3/utils.py: `calculate_aupr_fmax` (:19-32)
computes the area under each class's precision-recall curve and the max F1
along it, averaged over classes, used to score EC/GO probes trained on CSTP
embeddings. `update_dict_nonnull` (:5-18) merges config/metric dicts
without nulling existing values.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import numpy as np


def update_dict_nonnull(d: Dict[str, Any], vals: Dict[str, Any]) -> Dict[str, Any]:
    for k, v in vals.items():
        if k in d:
            if d[k] != v and v is not None:
                logging.info("Replacing key %s original value %s with %s",
                             k, d[k], v)
                d[k] = v
        else:
            d[k] = v
    return d


def precision_recall_curve(labels: np.ndarray, scores: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PR curve with sklearn semantics: thresholds descending by score,
    curve ends at (recall=0, precision=1)."""
    order = np.argsort(-scores, kind="stable")
    l = np.asarray(labels)[order].astype(np.float64)
    s = np.asarray(scores)[order].astype(np.float64)
    tp = np.cumsum(l)
    fp = np.cumsum(1.0 - l)
    # collapse duplicate thresholds: keep the last index of each distinct score
    distinct = np.where(np.diff(s))[0]
    idx = np.r_[distinct, len(s) - 1]
    tp, fp, thr = tp[idx], fp[idx], s[idx]
    total_pos = tp[-1] if len(tp) else 0.0
    prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1e-300), 0.0)
    rec = tp / total_pos if total_pos > 0 else np.zeros_like(tp)
    # sklearn ordering: increasing threshold (decreasing recall), then the
    # (precision=1, recall=0) endpoint
    return (np.r_[prec[::-1], 1.0], np.r_[rec[::-1], 0.0], thr[::-1])


def auc_trapezoid(x: np.ndarray, y: np.ndarray) -> float:
    """sklearn.metrics.auc semantics: x must be monotonic; no re-sorting
    (re-sorting scrambles plateau points with duplicate x and shifts the
    result)."""
    x = np.asarray(x)
    dx = np.diff(x)
    if len(dx) and not (np.all(dx >= 0) or np.all(dx <= 0)):
        raise ValueError("x must be monotonic for AUC")
    return float(abs(np.trapezoid(np.asarray(y), x)))


def aupr_fmax(labels: np.ndarray, scores: np.ndarray) -> Tuple[float, float]:
    """labels, scores: (N, C) binary / real -> (mean AUPR, mean Fmax)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    auprs, fmaxes = [], []
    for c in range(labels.shape[1]):
        prec, rec, _ = precision_recall_curve(labels[:, c], scores[:, c])
        auprs.append(auc_trapezoid(rec, prec))
        f1 = 2 * prec * rec / (prec + rec + np.finfo(float).eps)
        fmaxes.append(float(np.max(f1)))
    return float(np.mean(auprs)), float(np.mean(fmaxes))
