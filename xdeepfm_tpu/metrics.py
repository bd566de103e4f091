"""Metrics.

The reference syncs predictions to CPU **every training step** and calls sklearn
(``basemodel.py:264-269``) — its single biggest throughput sin (SURVEY.md §3.2).
Here train-time metrics are computed **on device inside the jitted train step**
(masked for padded tail batches) and only scalars come back per step; evaluation
metrics are exact numpy implementations over pooled predictions, matching
sklearn's semantics (tie-aware AUC, clipped logloss).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host (exact, numpy) — used by evaluate()/predict() pooling, sklearn-parity.
# ---------------------------------------------------------------------------


def roc_auc_score(y_true, y_score):
    """Exact AUC with average ranks for ties (== sklearn.roc_auc_score).

    2D [N, T] inputs -> macro average over columns (sklearn multilabel
    behavior, used by the reference's multitask evaluate path)."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    if y_true.ndim == 2 and y_true.shape[1] > 1:
        return float(
            np.mean(
                [
                    roc_auc_score(y_true[:, i], y_score[:, i])
                    for i in range(y_true.shape[1])
                ]
            )
        )
    y_true = y_true.reshape(-1)
    y_score = y_score.reshape(-1)
    pos = y_true > 0.5
    n_pos = int(pos.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "Only one class present in y_true. ROC AUC score is not defined."
        )
    sorted_scores = np.sort(y_score, kind="mergesort")
    # average rank (1-based) per element, ties averaged
    lo = np.searchsorted(sorted_scores, y_score, side="left")
    hi = np.searchsorted(sorted_scores, y_score, side="right")
    ranks = (lo + hi + 1) / 2.0
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def log_loss(y_true, y_pred, eps=1e-15):
    y_true = np.asarray(y_true, dtype=np.float64).reshape(-1)
    y_pred = np.clip(np.asarray(y_pred, dtype=np.float64).reshape(-1), eps, 1 - eps)
    return float(
        -np.mean(y_true * np.log(y_pred) + (1 - y_true) * np.log(1 - y_pred))
    )


def mean_squared_error(y_true, y_pred):
    y_true = np.asarray(y_true, dtype=np.float64).reshape(-1)
    y_pred = np.asarray(y_pred, dtype=np.float64).reshape(-1)
    return float(np.mean((y_true - y_pred) ** 2))


def accuracy_score(y_true, y_pred):
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    return float(np.mean((y_pred > 0.5).astype(np.int32) == y_true.astype(np.int32)))


HOST_METRICS = {
    "binary_crossentropy": log_loss,
    "logloss": log_loss,
    "auc": roc_auc_score,
    "mse": mean_squared_error,
    "accuracy": accuracy_score,
    "acc": accuracy_score,
}

# ---------------------------------------------------------------------------
# Device (jnp, masked) — per-batch train metrics inside the jitted step.
# ---------------------------------------------------------------------------


def batch_auc(y_true, y_score, mask):
    """Tie-aware AUC over the valid entries of a padded batch.

    Padded entries get score=-inf (strictly below ANY finite prediction —
    not just sigmoid outputs) and weight 0; they inflate every valid rank by
    exactly n_pad, which cancels in the formula.
    """
    y_true = y_true.reshape(-1)
    y_score = y_score.reshape(-1)
    mask = mask.reshape(-1)
    score = jnp.where(mask > 0, y_score, -jnp.inf)
    sorted_scores = jnp.sort(score)
    lo = jnp.searchsorted(sorted_scores, score, side="left")
    hi = jnp.searchsorted(sorted_scores, score, side="right")
    ranks = (lo + hi + 1) / 2.0
    n_pad = jnp.sum(mask <= 0)
    pos_w = mask * (y_true > 0.5)
    n_pos = jnp.sum(pos_w)
    n_neg = jnp.sum(mask) - n_pos
    sum_ranks_pos = jnp.sum(ranks * pos_w)
    denom = n_pos * n_neg
    auc = (sum_ranks_pos - n_pos * n_pad - n_pos * (n_pos + 1) / 2.0) / jnp.where(
        denom > 0, denom, 1.0
    )
    return jnp.where(denom > 0, auc, 0.5)


def batch_log_loss(y_true, y_pred, mask, eps=1e-15):
    y_true = y_true.reshape(-1)
    p = jnp.clip(y_pred.reshape(-1), eps, 1 - eps)
    mask = mask.reshape(-1)
    ll = -(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))
    return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def batch_mse(y_true, y_pred, mask):
    y_true = y_true.reshape(-1)
    y_pred = y_pred.reshape(-1)
    mask = mask.reshape(-1)
    return jnp.sum(mask * (y_true - y_pred) ** 2) / jnp.maximum(jnp.sum(mask), 1.0)


def batch_accuracy(y_true, y_pred, mask):
    y_true = y_true.reshape(-1)
    y_pred = y_pred.reshape(-1)
    mask = mask.reshape(-1)
    correct = ((y_pred > 0.5) == (y_true > 0.5)).astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)


DEVICE_METRICS = {
    "binary_crossentropy": batch_log_loss,
    "logloss": batch_log_loss,
    "auc": batch_auc,
    "mse": batch_mse,
    "accuracy": batch_accuracy,
    "acc": batch_accuracy,
}
