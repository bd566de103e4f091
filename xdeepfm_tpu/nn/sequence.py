"""Sequence ops (reference: ``deepctr/layers/sequence.py``).

The reference's ``DynamicGRU`` iterates PackedSequence chunks in a Python loop
(``sequence.py:296-320``); here the recurrences are ``jax.lax.scan`` over padded
sequences with per-step masking — identical semantics (hidden state freezes past
each sequence's length), compiler-friendly control flow.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .core import LocalActivationUnit


def sequence_mask(lengths, maxlen: int):
    """[B, 1] lengths -> bool [B, maxlen] (reference: ``sequence.py:38-47``)."""
    row = jnp.arange(maxlen)[None, :]
    return row < lengths.reshape(-1, 1)


def sequence_pool(seq_value_len_list, mode="mean", supports_masking=False):
    """Masked sum/mean/max pooling over varlen sequences — pure function
    (reference: ``sequence.py:9-77``).

    Call with ``(seq_emb [B,T,E], mask [B,T] bool)`` when supports_masking
    else ``(seq_emb, length [B,1])``.  Returns [B, 1, E].
    """
    if mode not in ["sum", "mean", "max"]:
        raise ValueError("parameter mode should in [sum, mean, max]")
    if supports_masking:
        seq_emb, mask = seq_value_len_list
        mask = mask.astype(jnp.float32)  # [B, T]
        user_behavior_length = jnp.sum(mask, axis=-1, keepdims=True)
        mask = mask[:, :, None]
    else:
        seq_emb, user_behavior_length = seq_value_len_list
        mask = sequence_mask(user_behavior_length, seq_emb.shape[1])
        mask = mask.astype(jnp.float32)[:, :, None]

    if mode == "max":
        hist = seq_emb - (1 - mask) * 1e9
        return jnp.max(hist, axis=1, keepdims=True)
    hist = jnp.sum(seq_emb * mask, axis=1, keepdims=False)
    if mode == "mean":
        hist = hist / (user_behavior_length.astype(jnp.float32) + 1e-8)
    return hist[:, None, :]


class SequencePoolingLayer(nn.Module):
    """Module wrapper around :func:`sequence_pool` (keeps the reference's
    layer-style API)."""

    mode: str = "mean"
    supports_masking: bool = False

    @nn.compact
    def __call__(self, seq_value_len_list):
        return sequence_pool(
            seq_value_len_list, self.mode, self.supports_masking
        )


class AttentionSequencePoolingLayer(nn.Module):
    """DIN attention pooling (reference: ``sequence.py:80-154``).

    query [B,1,E], keys [B,T,E], keys_length [B,1] (or mask [B,T]) -> [B,1,E]
    (or scores [B,1,T] when return_score).
    """

    att_hidden_units: Tuple[int, ...] = (80, 40)
    att_activation: str = "sigmoid"
    weight_normalization: bool = False
    return_score: bool = False
    supports_masking: bool = False
    embedding_dim: int = 4

    def setup(self):
        self.local_att = LocalActivationUnit(
            hidden_units=self.att_hidden_units,
            embedding_dim=self.embedding_dim,
            activation=self.att_activation,
            dropout_rate=0.0,
            use_bn=False,
            name="local_att",
        )

    def __call__(self, query, keys, keys_length=None, mask=None, training: bool = False):
        B, T, _ = keys.shape
        if self.supports_masking:
            if mask is None:
                raise ValueError(
                    "When supports_masking=True,input must support masking"
                )
            keys_masks = mask[:, None, :]  # [B, 1, T]
        else:
            keys_masks = (jnp.arange(T)[None, :] < keys_length.reshape(-1, 1))[
                :, None, :
            ]

        attention_score = self.local_att(query, keys, training=training)  # [B,T,1]
        outputs = jnp.swapaxes(attention_score, 1, 2)  # [B, 1, T]

        if self.weight_normalization:
            paddings = jnp.full_like(outputs, -(2.0**32) + 1)
        else:
            paddings = jnp.zeros_like(outputs)
        outputs = jnp.where(keys_masks, outputs, paddings)

        if self.weight_normalization:
            outputs = nn.softmax(outputs, axis=-1)
        if not self.return_score:
            outputs = jnp.matmul(outputs, keys)  # [B, 1, E]
        return outputs

    def scores_t(self, query_t, keys_t, lengths, training: bool = False):
        """Transposed lane-space scoring: query_t [E, B], keys_t [T, E, B] ->
        masked (softmax-normalized when ``weight_normalization``) scores
        [T, 1, B].  Same params/semantics as ``__call__`` with
        ``return_score``; DIEN's fast path."""
        T = keys_t.shape[0]
        valid = (
            jnp.arange(T)[:, None] < lengths.reshape(-1)[None, :]
        )[:, None, :]  # [T, 1, B]
        scores = self.local_att.call_t(query_t, keys_t, training=training)
        if self.weight_normalization:
            pad = jnp.full_like(scores, -(2.0**32) + 1)
        else:
            pad = jnp.zeros_like(scores)
        scores = jnp.where(valid, scores, pad)
        if self.weight_normalization:
            scores = nn.softmax(scores, axis=0)
        return scores


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def kmax_lastaxis(x, k):
    """Exact top-k values (sorted descending) along the last axis via k
    iterative max+mask passes.

    XLA:TPU lowers ``lax.top_k`` to a full sort — measured 25.7 ms of CCPM's
    29.0 ms train step at Criteo shapes.  For the small axes k-max pooling
    sees (the field axis, n <= a few dozen) k vectorized max passes are far
    cheaper, and the custom VJP scatters cotangents by the saved argmax
    indices instead of replaying the masking chain.  Iterative masking picks
    the FIRST occurrence on ties, like a stable sort.

    Precondition: inputs must be finite.  A row already containing -inf/NaN
    can make successive argmax passes return the SAME index (masking an
    -inf entry is a no-op), and the backward would then double-count that
    position's cotangent.  In-repo consumers (CCPM's tanh feature maps) are
    finite by construction."""
    return _kmax_iter(x, k)[0]


def _kmax_iter(x, k):
    n = x.shape[-1]
    ar = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        m = jnp.max(cur, axis=-1)
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(i)
        cur = jnp.where(ar == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def _kmax_fwd(x, k):
    vals, idxs = _kmax_iter(x, k)
    return vals, (idxs, x.shape[-1])


def _kmax_bwd(k, res, g):
    idxs, n = res
    ar = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    dx = jnp.zeros(g.shape[:-1] + (n,), g.dtype)
    for t in range(k):  # indices are distinct per row by construction
        dx = dx + jnp.where(ar == idxs[..., t : t + 1], g[..., t : t + 1], 0)
    return (dx,)


kmax_lastaxis.defvjp(_kmax_fwd, _kmax_bwd)


class KMaxPooling(nn.Module):
    """Top-k along an axis, sorted descending (reference: ``sequence.py:157-189``)."""

    k: int
    axis: int

    @nn.compact
    def __call__(self, inputs):
        if self.axis < 0 or self.axis >= inputs.ndim:
            raise ValueError(
                "axis must be 0~%d,now is %d" % (inputs.ndim - 1, self.axis)
            )
        if self.k < 1 or self.k > inputs.shape[self.axis]:
            raise ValueError(
                "k must be in 1 ~ %d,now k is %d" % (inputs.shape[self.axis], self.k)
            )
        moved = jnp.moveaxis(inputs, self.axis, -1)
        if self.k <= 32:
            top = kmax_lastaxis(moved, self.k)
        else:  # large k: the sort-based lowering wins
            top = jax.lax.top_k(moved, self.k)[0]
        return jnp.moveaxis(top, -1, self.axis)


def _gru_param_init(hidden_size: int):
    # torch GRU-style default; the reference leaves these weights UNINITIALIZED
    # (raw torch.Tensor, ``sequence.py:205-208``) which is a latent bug — we use
    # the standard U(±1/sqrt(H)) instead.
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# Unroll factor for the recurrent scans: a DIEN-shaped scan step is tens of
# microseconds of fixed loop overhead around ~1 MB of work, so unrolling
# amortizes the loop and lets XLA fuse across steps.
_SCAN_UNROLL = 10


def set_scan_unroll(n: int):
    global _SCAN_UNROLL
    _SCAN_UNROLL = max(1, int(n))


def _valid_t(lengths, T, dtype):
    """[B] lengths -> [T, 1, B] validity mask for transposed-space scans."""
    return (
        (jnp.arange(T)[:, None] < lengths.reshape(-1)[None, :])
        .astype(dtype)[:, None, :]
    )


class GRU(nn.Module):
    """Standard GRU over padded sequences with packed-sequence semantics:
    hidden state freezes and outputs are zero past each row's length
    (torch ``pack_padded_sequence`` + ``pad_packed_sequence(padding_value=0)``).

    Weight init: normal(init_std) when ``init_std`` is set (the reference
    re-inits GRU weights this way, ``dien.py:190-192``); biases keep the torch
    default U(±1/sqrt(H)).

    TPU layout: the input projection ``x_t @ W_ih^T`` is hoisted out of the
    scan as ONE batched matmul over all T steps, and the recurrence runs in
    transposed lane space ``[3H, B]`` (batch on the 128-lane axis) — the
    per-step gate math is fully lane-packed instead of padding 3H≈30 lanes
    to 128 on every elementwise op.
    """

    input_size: int
    hidden_size: int
    init_std: float = 0.001

    def setup(self):
        H = self.hidden_size
        w_init = nn.initializers.normal(stddev=self.init_std)
        b_init = _gru_param_init(H)
        self.weight_ih = self.param("weight_ih", w_init, (3 * H, self.input_size))
        self.weight_hh = self.param("weight_hh", w_init, (3 * H, H))
        self.bias_ih = self.param("bias_ih", b_init, (3 * H,))
        self.bias_hh = self.param("bias_hh", b_init, (3 * H,))

    def _run_t(self, gi, valid, h):
        """Core recurrence on hoisted gates gi [T, 3H, B]: returns FROZEN
        outs_t [T, H, B] (state held past each row's length, so outs_t[-1]
        is every row's last valid state; zero rows stay zero)."""
        T = gi.shape[0]
        B = gi.shape[2]
        H = self.hidden_size
        w_hh, b_hh = self.weight_hh, self.bias_hh

        from ..ops import gru_pallas

        if (
            gru_pallas.use_pallas()
            and gru_pallas.fits_vmem(T, H, B)
            and not self.is_initializing()
        ):
            # whole recurrence in one Pallas program per batch tile (the
            # lax.scan path is per-step-overhead bound; ops/gru_pallas.py)
            return gru_pallas.gru_scan(
                "gru",
                gi.reshape(T, 3, H, B),
                w_hh.reshape(3, H, H),
                b_hh.reshape(3, H, 1),
                jnp.zeros((T, 1, B), gi.dtype),
                valid,
                h,
            )

        def body(h, xs):
            gi_t, v = xs  # [3H, B], [1, B]
            gh = w_hh @ h + b_hh[:, None]
            i_r, i_z, i_n = jnp.split(gi_t, 3, axis=0)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=0)
            r = nn.sigmoid(i_r + h_r)
            z = nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            h_out = v * h_new + (1 - v) * h  # freeze past length
            return h_out, h_out

        _, outs = jax.lax.scan(body, h, (gi, valid), unroll=_SCAN_UNROLL)
        return outs

    def __call__(self, inputs, lengths, h0=None):
        B, T, _ = inputs.shape
        h = (
            jnp.zeros((self.hidden_size, B), dtype=inputs.dtype)
            if h0 is None
            else jnp.swapaxes(h0, 0, 1)
        )
        # hoisted input projection: one [T*B, I] x [I, 3H] matmul, laid out
        # [T, 3H, B] so each scan slice is lane-packed
        gi = (
            jnp.einsum("bti,gi->tgb", inputs, self.weight_ih)
            + self.bias_ih[None, :, None]
        )
        valid = _valid_t(lengths, T, inputs.dtype)
        outs_t = self._run_t(gi, valid, h)
        # frozen state => the last slice IS each row's final hidden state
        h_last = jnp.swapaxes(outs_t[-1], 0, 1)
        outputs = jnp.transpose(outs_t * valid, (2, 0, 1))
        return outputs, h_last

    def call_t(self, inputs_t, lengths, h0=None):
        """Fully-transposed entry: inputs_t [T, I, B] -> (frozen outs_t
        [T, H, B], h_last [H, B]).  No batch-major [B, T, H] tensor (whose
        H<=16 lane padding costs 13-26x HBM bytes at B=4096) is ever built —
        the lane-space path DIEN runs end-to-end."""
        T, _, B = inputs_t.shape
        h = (
            jnp.zeros((self.hidden_size, B), dtype=inputs_t.dtype)
            if h0 is None
            else h0
        )
        gi = (
            jnp.einsum("tib,gi->tgb", inputs_t, self.weight_ih)
            + self.bias_ih[None, :, None]
        )
        valid = _valid_t(lengths, T, inputs_t.dtype)
        outs_t = self._run_t(gi, valid, h)
        return outs_t, outs_t[-1]


class _AttGRUCellBase(nn.Module):
    """Shared parameter block for AGRU/AUGRU cells.  The batch-major
    ``__call__`` keeps the reference cell API; ``project_t`` + ``step_t``
    are the TPU fast path used by :class:`DynamicGRU` (input projection
    hoisted out of the scan, recurrence in transposed ``[3H, B]`` space)."""

    input_size: int
    hidden_size: int
    use_bias: bool = True
    # the reference re-inits every interest_evolution WEIGHT to
    # normal(0, init_std) after construction (``dien.py:315-318``) while the
    # cells' explicit bias zeros survive; None keeps the raw torch-cell
    # U(±1/sqrt(H)) default for standalone use
    init_std: Optional[float] = None

    def setup(self):
        H = self.hidden_size
        init = (
            nn.initializers.normal(stddev=self.init_std)
            if self.init_std is not None
            else _gru_param_init(H)
        )
        self.weight_ih = self.param("weight_ih", init, (3 * H, self.input_size))
        self.weight_hh = self.param("weight_hh", init, (3 * H, H))
        if self.use_bias:
            self.bias_ih = self.param(
                "bias_ih", nn.initializers.zeros, (3 * H,)
            )
            self.bias_hh = self.param(
                "bias_hh", nn.initializers.zeros, (3 * H,)
            )

    def project_t(self, inputs):
        """[B, T, I] -> hoisted input gates [T, 3H, B] (one batched matmul)."""
        gi = jnp.einsum("bti,gi->tgb", inputs, self.weight_ih)
        if self.use_bias:
            gi = gi + self.bias_ih[None, :, None]
        return gi

    def _gates_t(self, gi_t, h):
        gh = self.weight_hh @ h
        if self.use_bias:
            gh = gh + self.bias_hh[:, None]
        return jnp.split(gi_t, 3, axis=0), jnp.split(gh, 3, axis=0)

    def _gates(self, inputs, hx):
        gi = inputs @ self.weight_ih.T
        gh = hx @ self.weight_hh.T
        if self.use_bias:
            gi = gi + self.bias_ih
            gh = gh + self.bias_hh
        return jnp.split(gi, 3, axis=1), jnp.split(gh, 3, axis=1)


class AGRUCell(_AttGRUCellBase):
    """Attention-based GRU: attention score replaces the update gate
    (reference: ``sequence.py:192-235``)."""

    def __call__(self, inputs, hx, att_score):
        (i_r, _, i_n), (h_r, _, h_n) = self._gates(inputs, hx)
        reset_gate = nn.sigmoid(i_r + h_r)
        new_state = jnp.tanh(i_n + reset_gate * h_n)
        att = att_score.reshape(-1, 1)
        return (1.0 - att) * hx + att * new_state

    def step_t(self, gi_t, h, att_t):
        """gi_t [3H, B], h [H, B], att_t [1, B] -> new h [H, B]."""
        (i_r, _, i_n), (h_r, _, h_n) = self._gates_t(gi_t, h)
        reset_gate = nn.sigmoid(i_r + h_r)
        new_state = jnp.tanh(i_n + reset_gate * h_n)
        return (1.0 - att_t) * h + att_t * new_state


class AUGRUCell(_AttGRUCellBase):
    """GRU with attentional update gate (reference: ``sequence.py:238-282``)."""

    def __call__(self, inputs, hx, att_score):
        (i_r, i_z, i_n), (h_r, h_z, h_n) = self._gates(inputs, hx)
        reset_gate = nn.sigmoid(i_r + h_r)
        update_gate = nn.sigmoid(i_z + h_z)
        new_state = jnp.tanh(i_n + reset_gate * h_n)
        att = att_score.reshape(-1, 1)
        update_gate = att * update_gate
        return (1.0 - update_gate) * hx + update_gate * new_state

    def step_t(self, gi_t, h, att_t):
        (i_r, i_z, i_n), (h_r, h_z, h_n) = self._gates_t(gi_t, h)
        reset_gate = nn.sigmoid(i_r + h_r)
        update_gate = att_t * nn.sigmoid(i_z + h_z)
        new_state = jnp.tanh(i_n + reset_gate * h_n)
        return (1.0 - update_gate) * h + update_gate * new_state


class DynamicGRU(nn.Module):
    """AGRU/AUGRU over padded sequences via ``lax.scan``
    (replaces PackedSequence loop, reference ``sequence.py:285-320``).

    inputs [B, T, I], att_scores [B, T], lengths [B] -> outputs [B, T, H].
    Hidden state freezes for t >= length, matching packed-sequence semantics.
    Runs the TPU transposed-lane-space path (see :class:`GRU`): input
    projections hoisted to one batched matmul, per-step math in [3H, B].
    """

    input_size: int
    hidden_size: int
    use_bias: bool = True
    gru_type: str = "AGRU"
    init_std: Optional[float] = None  # see _AttGRUCellBase

    def setup(self):
        if self.gru_type == "AGRU":
            self.rnn = AGRUCell(self.input_size, self.hidden_size,
                                self.use_bias, init_std=self.init_std)
        elif self.gru_type == "AUGRU":
            self.rnn = AUGRUCell(self.input_size, self.hidden_size,
                                 self.use_bias, init_std=self.init_std)
        else:
            raise NotImplementedError(self.gru_type)

    def _run_t(self, gi, att, valid, h):
        """Core recurrence on hoisted gates gi [T, 3H, B] + attention
        [T, 1, B]: FROZEN outs_t [T, H, B]."""
        T = gi.shape[0]
        B = gi.shape[2]

        from ..ops import gru_pallas

        if (
            gru_pallas.use_pallas()
            and gru_pallas.fits_vmem(T, self.hidden_size, B)
            and not self.is_initializing()
        ):
            H = self.hidden_size
            b_hh = (
                self.rnn.bias_hh.reshape(3, H, 1)
                if self.use_bias
                else jnp.zeros((3, H, 1), gi.dtype)
            )
            return gru_pallas.gru_scan(
                self.gru_type.lower(),
                gi.reshape(T, 3, H, B),
                self.rnn.weight_hh.reshape(3, H, H),
                b_hh,
                att,
                valid,
                h,
            )

        scan_cell = nn.scan(
            _scan_body_t,
            variable_broadcast="params",
            split_rngs={"params": False},
            unroll=_SCAN_UNROLL,
        )
        _, outs = scan_cell(self.rnn, h, (gi, att, valid))
        return outs

    def __call__(self, inputs, att_scores, lengths, hx=None):
        B, T, _ = inputs.shape
        h = (
            jnp.zeros((self.hidden_size, B), dtype=inputs.dtype)
            if hx is None
            else jnp.swapaxes(hx, 0, 1)
        )
        gi = self.rnn.project_t(inputs)  # [T, 3H, B]
        att = jnp.swapaxes(att_scores, 0, 1)[:, None, :]  # [T, 1, B]
        valid = _valid_t(lengths, T, inputs.dtype)
        outs = self._run_t(gi, att, valid, h)
        return jnp.transpose(outs, (2, 0, 1))  # [B, T, H]

    def call_t(self, inputs_t, att_t, lengths, hx=None):
        """Fully-transposed entry: inputs_t [T, I, B], att_t [T, 1, B] ->
        frozen states [T, H, B] (DIEN's lane-space path; outs_t[-1] is each
        row's last valid state)."""
        T, _, B = inputs_t.shape
        h = (
            jnp.zeros((self.hidden_size, B), dtype=inputs_t.dtype)
            if hx is None
            else hx
        )
        gi = jnp.einsum("tib,gi->tgb", inputs_t, self.rnn.weight_ih)
        if self.use_bias:
            gi = gi + self.rnn.bias_ih[None, :, None]
        valid = _valid_t(lengths, T, inputs_t.dtype)
        return self._run_t(gi, att_t, valid, h)


def _scan_body_t(cell, h, xs):
    gi_t, a_t, v_t = xs
    h_new = cell.step_t(gi_t, h, a_t)
    h_out = v_t * h_new + (1 - v_t) * h
    return h_out, h_out
