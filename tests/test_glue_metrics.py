"""Per-task GLUE metrics vs hand-computed fixtures (reference parity:
HF `load_metric('glue', subset)` semantics, glue_trainer.py:321-359)."""

import numpy as np
import pytest

from sea_tpu.training.glue_metrics import (
    accuracy,
    f1_binary,
    glue_compute,
    matthews_corrcoef,
    pearson_r,
    primary_score,
    spearman_r,
)


def test_matthews_hand_fixture():
    preds = np.array([1, 1, 0, 1, 0, 0, 1])
    labels = np.array([1, 1, 1, 1, 0, 0, 0])
    # confusion: tp=3 (idx 0,1,3), fn=1 (2), tn=2 (4,5), fp=1 (6)
    tp, fn, tn, fp = 3, 1, 2, 1
    want = (tp * tn - fp * fn) / np.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(matthews_corrcoef(preds, labels) - want) < 1e-12
    # degenerate single-class predictions -> 0 (sklearn convention)
    assert matthews_corrcoef(np.zeros(4), np.array([0, 1, 0, 1])) == 0.0


def test_f1_hand_fixture():
    preds = np.array([1, 0, 1, 1, 0])
    labels = np.array([1, 1, 0, 1, 0])
    # tp=2, fp=1, fn=1 -> precision=2/3, recall=2/3, f1=2/3
    assert abs(f1_binary(preds, labels) - 2 / 3) < 1e-12
    assert f1_binary(np.zeros(3), np.zeros(3)) == 0.0  # no positives


def test_pearson_spearman_hand_fixtures():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    assert abs(pearson_r(x, 2 * x + 3) - 1.0) < 1e-12
    assert abs(pearson_r(x, -x) + 1.0) < 1e-12
    # monotone nonlinear: spearman 1, pearson < 1
    y = x ** 3
    assert abs(spearman_r(x, y) - 1.0) < 1e-12
    assert pearson_r(x, y) < 1.0
    # tie handling: average ranks (scipy.rankdata semantics)
    xt = np.array([1.0, 2.0, 2.0, 3.0])
    yt = np.array([10.0, 20.0, 20.0, 30.0])
    assert abs(spearman_r(xt, yt) - 1.0) < 1e-12
    # known value: x=[1,2,3,4,5], y=[5,6,7,8,7] -> rho = 0.8207826816681233
    # (classic scipy docs example)
    rho = spearman_r(
        np.array([1, 2, 3, 4, 5.0]), np.array([5, 6, 7, 8, 7.0])
    )
    assert abs(rho - 0.8207826816681233) < 1e-12


@pytest.mark.parametrize(
    "subset,keys,primary",
    [
        ("cola", {"matthews_correlation"}, "matthews_correlation"),
        ("mrpc", {"accuracy", "f1"}, "f1"),
        ("qqp", {"accuracy", "f1"}, "f1"),
        ("stsb", {"pearson", "spearmanr"}, "pearson"),
        ("sst2", {"accuracy"}, "accuracy"),
        ("mnli", {"accuracy"}, "accuracy"),
    ],
)
def test_glue_dispatch(subset, keys, primary):
    if subset == "stsb":
        preds = np.array([0.1, 0.5, 0.9, 0.2])
        labels = np.array([0.0, 1.0, 1.0, 0.0])
    else:
        preds = np.array([0, 1, 1, 0])
        labels = np.array([0, 1, 0, 0])
    m = glue_compute(subset, preds, labels)
    assert set(m) == keys
    assert primary_score(subset, m) == m[primary]


def test_accuracy():
    assert accuracy(np.array([1, 2, 3]), np.array([1, 0, 3])) == pytest.approx(
        2 / 3
    )
