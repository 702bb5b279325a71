"""Training-time statistics helpers (reference C22/C23).

numpy/jax re-implementations of the bits of `pancreas/statistic.py:7-214`
and `utils/metrics.py:13-46` the pipelines actually touch (`dice_ratio`
feeds the pancreas `CutPreMeasures` train-dice meter,
`pancreas/pancreas_utils.py:130`), plus the commonly-useful extras.
"""

from __future__ import annotations

import numpy as np


def _flat(x):
    return np.asarray(x).reshape(-1).astype(np.float64)


def dice_ratio(masks, labels) -> float:
    """Global binary dice with +1e-6 smoothing —
    `pancreas/statistic.py:28-43`."""
    m1, m2 = _flat(masks), _flat(labels)
    inter = (m1 * m2).sum()
    return float(2.0 * inter / (m1.sum() + m2.sum() + 1e-6))


def dice_loss_score(masks, labels, is_average: bool = True):
    """Per-sample dice score with +1.0 smoothing —
    `pancreas/statistic.py:7-25`."""
    m = np.asarray(masks).reshape(len(masks), -1).astype(np.float64)
    l = np.asarray(labels).reshape(len(labels), -1).astype(np.float64)
    inter = (m * l).sum(axis=1)
    score = 2.0 * inter / (m.sum(axis=1) + l.sum(axis=1) + 1.0)
    return float(score.mean()) if is_average else score


def cal_dice(prediction, label, num: int = 2) -> np.ndarray:
    """Per-class dice vector over classes 1..num-1 —
    `utils/metrics.py:13-24`."""
    out = np.zeros(num - 1)
    for i in range(1, num):
        p = (np.asarray(prediction) == i).astype(np.float64)
        g = (np.asarray(label) == i).astype(np.float64)
        denom = p.sum() + g.sum()
        out[i - 1] = 2.0 * (p * g).sum() / denom if denom > 0 else 0.0
    return out


def smooth_dice(input_mask, target, ignore_index=None) -> float:
    """Laplace-smoothed (+1) global dice — `utils/metrics.py:36-46`."""
    iflat, tflat = _flat(input_mask), _flat(target).copy()
    if ignore_index is not None:
        sel = tflat == ignore_index
        tflat[sel] = 0
        iflat = iflat.copy()
        iflat[sel] = 0
    inter = (iflat * tflat).sum()
    return float((2.0 * inter + 1.0) / (iflat.sum() + tflat.sum() + 1.0))


def accuracy(pred, gt) -> float:
    pred, gt = np.asarray(pred), np.asarray(gt)
    return float((pred == gt).mean())


def precision_recall(pred, gt):
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    tp = float(np.count_nonzero(pred & gt))
    p = tp / max(float(np.count_nonzero(pred)), 1e-8)
    r = tp / max(float(np.count_nonzero(gt)), 1e-8)
    return p, r
