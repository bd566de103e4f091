"""Lazy (row-sparse) embedding optimizers.

At production vocab sizes the dense optimizer is the bottleneck: Adam rewrites
p/m/v for EVERY table row each step (the 10.4M-row Criteo-shaped run measured
30.7 ms/step, ~22 ms of it full-table optimizer+reg traffic).  The torch
reference has exactly this behavior (dense ``nn.Embedding`` + Adam).

Lazy mode updates only the rows touched by the batch — the standard recsys
trade (torch calls it SparseAdam): untouched rows' moments do not decay.  The
batch's dense scatter-added gradient ``g`` already holds the per-row SUM over
duplicate ids, so gathering ``g[ids]`` and writing with ``.at[ids].set`` is
exact even with duplicates (identical values written).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lazy_adam_init(table):
    return (jnp.zeros_like(table), jnp.zeros_like(table))


def _row_set(arr, ids, vals):
    # duplicate ids always carry IDENTICAL values here (they were gathered
    # from the same summed-gradient row), so declaring unique_indices is safe
    # and lets XLA emit the parallel scatter instead of a serialized one.
    # mode='drop' lets the gradient-split path redirect duplicate positions
    # to an out-of-bounds id so only the first occurrence writes.
    return arr.at[ids].set(vals, unique_indices=True, mode="drop")


def lazy_adam_rows(p, state, ids, g_rows, t, lr=1e-3, b1=0.9, b2=0.999,
                   eps=1e-8):
    """Row-wise Adam on the touched rows only.  t is the 1-based step."""
    m, v = state
    m_rows = b1 * m[ids] + (1 - b1) * g_rows
    v_rows = b2 * v[ids] + (1 - b2) * jnp.square(g_rows)
    t = t.astype(jnp.float32)
    mhat = m_rows / (1 - jnp.power(b1, t))
    vhat = v_rows / (1 - jnp.power(b2, t))
    p_rows = p[ids] - lr * mhat / (jnp.sqrt(vhat) + eps)
    return (
        _row_set(p, ids, p_rows),
        (_row_set(m, ids, m_rows), _row_set(v, ids, v_rows)),
    )


def lazy_adagrad_init(table):
    return (jnp.zeros_like(table),)


def lazy_adagrad_rows(p, state, ids, g_rows, t, lr=0.01, eps=1e-10):
    (acc,) = state
    acc_rows = acc[ids] + jnp.square(g_rows)
    p_rows = p[ids] - lr * g_rows / (jnp.sqrt(acc_rows) + eps)
    return (_row_set(p, ids, p_rows), (_row_set(acc, ids, acc_rows),))


LAZY_OPTIMIZERS = {
    "adam": (lazy_adam_init, lazy_adam_rows, {"lr": 1e-3}),
    "adagrad": (lazy_adagrad_init, lazy_adagrad_rows, {"lr": 0.01}),
}
