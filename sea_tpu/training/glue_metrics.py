"""Per-task GLUE metrics (reference uses HF `load_metric('glue', subset)`,
`/root/reference/src/trainer/glue_trainer.py:321-359`; zero-egress here, so
the metric math is implemented directly — same definitions as
sklearn/scipy/HF glue):

  cola              -> Matthews correlation
  mrpc, qqp         -> accuracy + F1 (primary: F1)
  stsb              -> Pearson + Spearman r (primary: Pearson)
  everything else   -> accuracy
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def accuracy(preds: np.ndarray, labels: np.ndarray) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    return float((preds == labels).mean()) if len(labels) else 0.0


def f1_binary(preds: np.ndarray, labels: np.ndarray) -> float:
    """F1 of the positive class (HF glue default for mrpc/qqp)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    tp = float(((preds == 1) & (labels == 1)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def matthews_corrcoef(preds: np.ndarray, labels: np.ndarray) -> float:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    tp = float(((preds == 1) & (labels == 1)).sum())
    tn = float(((preds == 0) & (labels == 0)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return float((tp * tn - fp * fn) / denom) if denom > 0 else 0.0


def pearson_r(x: np.ndarray, y: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xm, ym = x - x.mean(), y - y.mean()
    denom = np.sqrt((xm ** 2).sum() * (ym ** 2).sum())
    return float((xm * ym).sum() / denom) if denom > 0 else 0.0


def _rank(x: np.ndarray) -> np.ndarray:
    """Average ranks (ties share the mean rank), as scipy.stats.rankdata."""
    x = np.asarray(x, np.float64)
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), np.float64)
    ranks[order] = np.arange(1, len(x) + 1, dtype=np.float64)
    # average tied groups
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = ranks[order[i : j + 1]].mean()
        i = j + 1
    return ranks


def spearman_r(x: np.ndarray, y: np.ndarray) -> float:
    return pearson_r(_rank(x), _rank(y))


def glue_compute(subset: str, preds: np.ndarray, labels: np.ndarray
                 ) -> Dict[str, float]:
    """Task-dispatched metric dict (same keys as HF `glue`). `preds` are
    class ids for classification tasks, raw scores for stsb."""
    if subset == "cola":
        return {"matthews_correlation": matthews_corrcoef(preds, labels)}
    if subset in ("mrpc", "qqp"):
        return {
            "accuracy": accuracy(preds, labels),
            "f1": f1_binary(preds, labels),
        }
    if subset == "stsb":
        return {
            "pearson": pearson_r(preds, labels),
            "spearmanr": spearman_r(preds, labels),
        }
    return {"accuracy": accuracy(preds, labels)}


def primary_score(subset: str, metrics: Dict[str, float]) -> float:
    """The single score the reference logs to wandb ('eval/score')."""
    order = ("matthews_correlation", "f1", "pearson", "accuracy")
    for k in order:
        if k in metrics:
            return metrics[k]
    return next(iter(metrics.values()))
