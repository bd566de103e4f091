"""Lazy (row-sparse) embedding optimizers.

At production vocab sizes the dense optimizer is the bottleneck: Adam rewrites
p/m/v for EVERY table row each step (the 10.4M-row Criteo-shaped run measured
30.7 ms/step, ~22 ms of it full-table optimizer+reg traffic).  The torch
reference has exactly this behavior (dense ``nn.Embedding`` + Adam).

Lazy mode updates only the rows touched by the batch — the standard recsys
trade (torch calls it SparseAdam): untouched rows' moments do not decay.  The
row gradient ``g_rows`` holds, for every occurrence of an id, the SUM over all
duplicate occurrences, so duplicate positions always write IDENTICAL values
and ``.at[ids].set`` is exact.

XLA:TPU lowers a row scatter on a [10M, 10] table to a serialized per-index
loop (~12.5 ms per scatter for 106k rows on v5e, measured — independent of
sortedness hints), so the scatter COUNT is the cost model: Adam's m/v moments
pack into ONE [rows, 2*dim] state array (one gather + one scatter instead of
two of each).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lazy_adam_init(table):
    # m and v packed side by side: [rows, 2*dim]
    rows, dim = table.shape
    return jnp.zeros((rows, 2 * dim), table.dtype)


def _row_set(arr, ids, vals, sorted_ids=False):
    # duplicate ids always carry IDENTICAL values here (per-occurrence run
    # sums), so declaring unique_indices is safe and lets XLA emit the
    # parallel scatter instead of a serialized one.  mode='drop' tolerates
    # out-of-range padding ids.
    return arr.at[ids].set(
        vals, unique_indices=True, mode="drop", indices_are_sorted=sorted_ids
    )


def lazy_adam_row_math(p_rows, mv_rows, g_rows, t, lr=1e-3, b1=0.9,
                       b2=0.999, eps=1e-8):
    """Pure row math for the Adam update: no table access.  ``p_rows``
    [N, D], ``mv_rows`` [N, 2D] (m|v packed), ``g_rows`` [N, D] — returns
    ``(p_rows_new, mv_rows_new)``.  Shared by the separate-state path below
    and the packed [rows, 3D] layout (param|m|v in ONE array)."""
    D = p_rows.shape[1]
    m_rows = b1 * mv_rows[:, :D] + (1 - b1) * g_rows
    v_rows = b2 * mv_rows[:, D:] + (1 - b2) * jnp.square(g_rows)
    t = t.astype(jnp.float32)
    mhat = m_rows / (1 - jnp.power(b1, t))
    vhat = v_rows / (1 - jnp.power(b2, t))
    p_new = p_rows - lr * mhat / (jnp.sqrt(vhat) + eps)
    return p_new, jnp.concatenate([m_rows, v_rows], axis=1)


def lazy_adam_rows(p, state, ids, g_rows, t, lr=1e-3, b1=0.9, b2=0.999,
                   eps=1e-8, sorted_ids=False, p_rows=None):
    """Row-wise Adam on the touched rows only.  t is the 1-based step.

    ``p_rows`` (optional): the CURRENT values of the touched rows in ``ids``
    order.  Every caller already holds them (the gradient-split engine
    gathered them for the forward; the reg gradient needs them too), and
    XLA lowers a random row gather as a serialized per-index loop
    (~117 ns/row) — passing them in removes a whole table walk per step.

    Returns ``(p_new, state_new, p_rows_new)`` — the third element is the
    updated row values in ``ids`` order, so callers (the gradient-split
    engine's incremental L2-reg tracker) can compute per-step deltas without
    an extra serialized row gather.  Out-of-range padding ids (sharded
    callers pad with id == rows) are DROPPED by the table writes; their
    ``p_rows_new`` entries are clipped-row phantoms — do not consume them."""
    mv_rows = state.at[ids].get(
        mode="clip", indices_are_sorted=sorted_ids
    )
    if p_rows is None:
        p_rows = p.at[ids].get(mode="clip", indices_are_sorted=sorted_ids)
    p_rows, mv_new = lazy_adam_row_math(
        p_rows, mv_rows, g_rows, t, lr=lr, b1=b1, b2=b2, eps=eps
    )
    return (
        _row_set(p, ids, p_rows, sorted_ids),
        _row_set(state, ids, mv_new, sorted_ids),
        p_rows,
    )


def lazy_adagrad_init(table):
    return jnp.zeros_like(table)


def lazy_adagrad_row_math(p_rows, acc_rows, g_rows, t, lr=0.01, eps=1e-10):
    """Pure row math for the Adagrad update (see lazy_adam_row_math)."""
    del t
    acc_rows = acc_rows + jnp.square(g_rows)
    return p_rows - lr * g_rows / (jnp.sqrt(acc_rows) + eps), acc_rows


def lazy_adagrad_rows(p, state, ids, g_rows, t, lr=0.01, eps=1e-10,
                      sorted_ids=False, p_rows=None):
    """See :func:`lazy_adam_rows` for the ``p_rows`` / padding-id contract."""
    acc_rows = state.at[ids].get(
        mode="clip", indices_are_sorted=sorted_ids
    )
    if p_rows is None:
        p_rows = p.at[ids].get(mode="clip", indices_are_sorted=sorted_ids)
    p_rows, acc_rows = lazy_adagrad_row_math(
        p_rows, acc_rows, g_rows, t, lr=lr, eps=eps
    )
    return (
        _row_set(p, ids, p_rows, sorted_ids),
        _row_set(state, ids, acc_rows, sorted_ids),
        p_rows,
    )


LAZY_OPTIMIZERS = {
    "adam": (lazy_adam_init, lazy_adam_rows, {"lr": 1e-3}),
    "adagrad": (lazy_adagrad_init, lazy_adagrad_rows, {"lr": 0.01}),
}

# Packed-layout companions: (pure row math fn, state width in multiples of
# the param dim).  A packed lazy table stores [rows, (1 + k) * D] —
# param | optimizer state side by side — so the gradient-split step's one
# per-occurrence gather serves BOTH the forward block and the moment rows,
# and the update collapses to ONE scatter (XLA serializes row scatters
# per index, so the walk COUNT is the cost model — see module docstring).
LAZY_ROW_MATH = {
    "adam": (lazy_adam_row_math, 2),
    "adagrad": (lazy_adagrad_row_math, 1),
}


# ---------------------------------------------------------------------------
# bf16 optimizer-state codec for the packed layout.
#
# With compile(embedding_state_dtype='bfloat16') the k*D state values are
# stored as bf16 PAIRS bit-packed into ceil(k*D/2) fp32 columns of the packed
# array (param columns stay fp32).  This halves the state's HBM footprint —
# the difference between 104M-row Adam fitting one 16 GiB chip or not: fp32
# m|v would need [104M, 30] -> padded 32 -> 13.3 GB before counting the
# param columns, bf16 packs the same table into [104M, 20] -> 24 -> 9.98 GB.
# Moment rounding to bf16 (8 mantissa bits) perturbs trajectories slightly;
# the row MATH still runs in fp32 every step.
# ---------------------------------------------------------------------------


def state_slots(k_d: int, dtype) -> int:
    """fp32 columns needed for k_d state values in ``dtype``."""
    if dtype is None or jnp.dtype(dtype) == jnp.float32:
        return k_d
    assert jnp.dtype(dtype) == jnp.bfloat16, dtype
    return -(-k_d // 2)


def encode_state(st, dtype):
    """[N, k_d] fp32 state -> [N, slots] fp32 storage columns."""
    if dtype is None or jnp.dtype(dtype) == jnp.float32:
        return st
    n, k_d = st.shape
    b = st.astype(jnp.bfloat16)
    if k_d % 2:
        b = jnp.pad(b, ((0, 0), (0, 1)))
    return jax.lax.bitcast_convert_type(
        b.reshape(n, -1, 2), jnp.float32
    )


def decode_state(cols, k_d: int, dtype):
    """[N, slots] fp32 storage columns -> [N, k_d] fp32 state."""
    if dtype is None or jnp.dtype(dtype) == jnp.float32:
        return cols
    n = cols.shape[0]
    b = jax.lax.bitcast_convert_type(cols, jnp.bfloat16)  # [N, slots, 2]
    return b.reshape(n, -1)[:, :k_d].astype(jnp.float32)


def segment_run_sums(sorted_vals, is_first):
    """Per-occurrence run totals over sorted segments, without a scatter:
    every position k in a run of equal sorted ids receives the SUM of the
    run's values, via cumsum differences at run boundaries.  [N, D] -> [N, D].

    fp32 prefix-sum differencing loses ~sqrt(N)*eps relative precision vs
    exact per-run summation — the same order as autodiff's unordered
    scatter-add accumulation.
    """
    n = sorted_vals.shape[0]
    idx = jnp.arange(n)
    run_start = jax.lax.cummax(jnp.where(is_first, idx, 0))
    nf_incl = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(is_first, idx, n))))
    run_end_excl = jnp.concatenate([nf_incl[1:], jnp.array([n])])
    csum0 = jnp.concatenate(
        [jnp.zeros((1,) + sorted_vals.shape[1:], sorted_vals.dtype),
         jnp.cumsum(sorted_vals, axis=0)],
        axis=0,
    )
    return jnp.take(csum0, run_end_excl, axis=0) - jnp.take(
        csum0, run_start, axis=0
    )
