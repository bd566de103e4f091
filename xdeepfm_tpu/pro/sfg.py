"""Supervised Feature Generation (reference: ``deepctr/xdeepfm_pro/sfg_decoder.py``).

Decoder reconstructs the input features from embeddings with a label-aware,
positive-masked reconstruction loss — the fork author's anti-embedding-collapse
mechanism (SURVEY.md §0).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.core import torch_bias_init, torch_linear_init
from ..ops import ce_pallas


class LabelAwareAttention(nn.Module):
    """Sigmoid gate over the decoder input conditioned on the binary label
    (reference ``sfg_decoder.py:160-206``)."""

    input_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, x, labels):
        labels = labels.reshape(-1).astype(jnp.int32)
        label_table = self.param(
            "label_embedding", nn.initializers.normal(stddev=1.0),
            (2, self.hidden_dim),
        )
        # one-hot matmul select: a static take's backward is an XLA
        # scatter-add serialized per row on TPU (~117 ns/row); the [B, 2]
        # one-hot dot gives the same values with a matmul backward
        onehot = jax.nn.one_hot(labels, 2, dtype=label_table.dtype)
        label_emb = onehot @ label_table
        combined = jnp.concatenate([x, label_emb], axis=-1)
        h = nn.Dense(
            self.hidden_dim,
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(self.input_dim + self.hidden_dim),
            name="att1",
        )(combined)
        h = nn.relu(h)
        h = nn.Dense(
            self.input_dim,
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(self.hidden_dim),
            name="att2",
        )(h)
        return nn.sigmoid(h)


def _head_ce_rows(head, h, targets):
    """Per-row cross-entropy of one vocab-sized softmax head, computed from
    the shared hidden state.  Wrapped in ``nn.remat`` below so the [B, vocab]
    logits (164 MB/head at B=4096, vocab 10k) are a transient of BOTH passes
    instead of autodiff-saved residuals — at 26 Criteo heads that saved
    ~4.3 GB of HBM round-trips per step for one extra head matmul in the
    backward."""
    logits = head(h)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, targets[:, None], axis=-1
    ).reshape(-1)
    return logz - picked


_head_ce_rows_remat = nn.remat(_head_ce_rows)


class SFGDecoder(nn.Module):
    """Shared MLP -> per-sparse-feature softmax heads + one dense regression
    head (reference ``sfg_decoder.py:19-157``).

    Input: sparse embeddings [B, F, E], dense values [B, D], labels [B, 1].
    ``__call__`` returns (sparse_logits dict, dense_preds [B, D]) as in the
    reference; the training path uses :meth:`ce_rows`, which fuses each head
    with its cross-entropy under rematerialization so the vocab-sized logits
    never persist in HBM.
    """

    embedding_dim: int
    sparse_vocab_sizes: Tuple[Tuple[str, int], ...]  # ordered (name, vocab)
    num_dense: int  # dense WIDTH (sum of DenseFeat dimensions), not count
    hidden_units: Tuple[int, ...] = (128, 64)
    dropout_rate: float = 0.1
    use_label_aware_attention: bool = True
    # fields in the incoming embedding stack; defaults to the decoded sparse
    # features, but callers feeding varlen-pooled embeddings too (the pro
    # model's stacked_inputs) pass the full count so the label-attention
    # gate width matches the actual decoder input
    num_fields: Optional[int] = None

    def setup(self):
        if self.use_label_aware_attention:
            self.label_attention = LabelAwareAttention(
                input_dim=self._input_dim(),
                hidden_dim=self.hidden_units[0] if self.hidden_units else 64,
                name="label_attention",
            )
        prev = self._input_dim()
        shared = []
        for i, units in enumerate(self.hidden_units):
            shared.append(
                nn.Dense(
                    units,
                    kernel_init=torch_linear_init,
                    bias_init=torch_bias_init(prev),
                    name=f"shared_{i}",
                )
            )
            prev = units
        self.shared_layers = shared
        self.shared_dropouts = [
            nn.Dropout(rate=self.dropout_rate) for _ in self.hidden_units
        ]
        self.heads = [
            nn.Dense(
                vocab,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(prev),
                name=f"head_{name}",
            )
            for name, vocab in self.sparse_vocab_sizes
        ]
        if self.num_dense > 0:
            self.dense_head = nn.Dense(
                self.num_dense,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(prev),
                name="dense_head",
            )

    def _input_dim(self):
        fields = (
            self.num_fields
            if self.num_fields is not None
            else len(self.sparse_vocab_sizes)
        )
        return fields * self.embedding_dim + self.num_dense

    def hidden(self, sparse_embeddings, dense_values, labels=None,
               training: bool = False):
        """Shared trunk: concat -> optional label-aware gate -> MLP."""
        B = sparse_embeddings.shape[0]
        sparse_concat = sparse_embeddings.reshape(B, -1)
        decoder_input = jnp.concatenate([sparse_concat, dense_values], axis=-1)
        if self.use_label_aware_attention and labels is not None:
            gate = self.label_attention(decoder_input, labels)
            decoder_input = decoder_input * gate
        h = decoder_input
        for layer, drop in zip(self.shared_layers, self.shared_dropouts):
            h = layer(h)
            h = nn.relu(h)
            h = drop(h, deterministic=not training)
        return h

    def __call__(self, sparse_embeddings, dense_values, labels=None,
                 training: bool = False):
        B = sparse_embeddings.shape[0]
        h = self.hidden(sparse_embeddings, dense_values, labels, training)
        sparse_logits = {}
        for (name, _), head in zip(self.sparse_vocab_sizes, self.heads):
            sparse_logits[name] = head(h)
        dense_preds = (
            self.dense_head(h) if self.num_dense > 0 else jnp.zeros((B, 0))
        )
        return sparse_logits, dense_preds

    def ce_rows(self, sparse_embeddings, dense_values, sparse_targets,
                labels=None, training: bool = False, impl: str = "remat",
                row_mask=None):
        """Fused heads+CE: {name: per-row -log p(target)} and dense_preds.

        impl='remat': each head's [B, vocab] logits rematerialized in the
        backward (still one HBM round-trip per pass).  impl='pallas': the
        flash-CE kernel (``ops/ce_pallas.py``) — logit blocks live only in
        VMEM; online logsumexp forward, blockwise dW/db/dh backward.  The
        pallas backward holds a fp32 [B, hidden] accumulator in VMEM, so
        oversized batch*hidden products auto-fall back to remat
        (``ce_pallas.fits_vmem``).

        row_mask (pallas only): the loss's per-row weight pattern (positive
        mask x sample mask).  Masked-out rows' CE is multiplied by ZERO in
        :func:`sfg_loss_rows` — forward and backward — so rows are sorted
        by the mask and the kernels skip whole tiles past the valid prefix
        (typical CTR batches are ~25-50% positive -> ~2-4x less CE work;
        exact for any labels).  Their returned ll entries are 0.
        """
        B = sparse_embeddings.shape[0]
        h = self.hidden(sparse_embeddings, dense_values, labels, training)
        if impl == "pallas" and not ce_pallas.fits_vmem(B, h.shape[-1]):
            impl = "remat"
        perm = inv = nv = None
        h_k = h
        if (
            impl == "pallas"
            and row_mask is not None
            and not self.is_initializing()
        ):
            perm, inv, nv = ce_pallas.sort_rows_by_mask(row_mask)
            h_k = ce_pallas.permute_rows(h, perm, inv)

        def pick_targets(t):
            t = t.reshape(-1)
            return t if perm is None else jnp.take(t, perm)

        def unsort_rows(ll):
            return ll if perm is None else ce_pallas.permute_rows(
                ll, inv, perm
            )

        ll_rows = {}
        if (
            impl == "pallas"
            and not self.is_initializing()
            and ce_pallas.stack_heads_enabled()
        ):
            # bucket heads by 128-padded vocab: same-shape heads run in ONE
            # stacked kernel launch (no per-head dispatch, no pipeline drain
            # between heads); odd-sized heads fall back to per-head calls.
            # OPT-IN (ce_pallas.set_stack_heads): at bench shapes the stacked
            # kernel measured NEUTRAL vs per-head (15.19 vs 15.19 ms fwd+bwd)
            # while the per-step W/b stack+pad copies and the gradient
            # unstack made the full train step ~1 ms WORSE (2026-08-20).
            buckets = {}
            for (name, vocab), head in zip(self.sparse_vocab_sizes, self.heads):
                vp = -(-vocab // 128) * 128
                buckets.setdefault(vp, []).append((name, vocab, head))
            for vp, items in buckets.items():
                if len(items) == 1:
                    name, _, head = items[0]
                    kernel = head.variables["params"]["kernel"]
                    bias = head.variables["params"]["bias"]
                    ll_rows[name] = unsort_rows(ce_pallas.fused_ce_rows(
                        h_k, kernel, bias, pick_targets(sparse_targets[name]),
                        num_valid=nv,
                    ))
                    continue
                Ws, bs, ts = [], [], []
                for name, vocab, head in items:
                    kernel = head.variables["params"]["kernel"]
                    bias = head.variables["params"]["bias"]
                    Ws.append(jnp.pad(
                        kernel.astype(jnp.float32), ((0, 0), (0, vp - vocab))
                    ))
                    bs.append(jnp.pad(
                        bias.astype(jnp.float32), (0, vp - vocab),
                        constant_values=ce_pallas._NEG,
                    ))
                    ts.append(pick_targets(sparse_targets[name]))
                ll = ce_pallas.fused_ce_rows_stacked(
                    h_k, jnp.stack(Ws), jnp.stack(bs), jnp.stack(ts),
                    num_valid=nv,
                )
                if perm is not None:
                    ll = ce_pallas.unpermute_cols(ll, perm, inv)
                for r, (name, _, _) in enumerate(items):
                    ll_rows[name] = ll[r]
        elif impl == "pallas" and not self.is_initializing():
            for (name, _), head in zip(self.sparse_vocab_sizes, self.heads):
                kernel = head.variables["params"]["kernel"]
                bias = head.variables["params"]["bias"]
                ll_rows[name] = unsort_rows(ce_pallas.fused_ce_rows(
                    h_k, kernel, bias, pick_targets(sparse_targets[name]),
                    num_valid=nv,
                ))
        else:
            for (name, _), head in zip(self.sparse_vocab_sizes, self.heads):
                targets = sparse_targets[name].reshape(-1)
                if impl == "pallas":
                    # create params with a 1-row apply; skip the kernel —
                    # tracing it at init costs an extra multi-minute TPU
                    # compile through the device tunnel for a throwaway value
                    _ = head(h[:1])
                    ll_rows[name] = jnp.zeros((B,), jnp.float32)
                else:
                    ll_rows[name] = _head_ce_rows_remat(head, h, targets)
        dense_preds = (
            self.dense_head(h) if self.num_dense > 0 else jnp.zeros((B, 0))
        )
        return ll_rows, dense_preds


def sfg_loss(
    sparse_logits: Dict[str, jnp.ndarray],
    dense_preds,
    sparse_targets: Dict[str, jnp.ndarray],
    dense_targets,
    labels,
    sample_mask=None,
    positive_only: bool = True,
    sparse_weight: float = 1.0,
    dense_weight: float = 1.0,
):
    """Per-feature CE + dense MSE, masked to positive samples and normalized by
    the positive count (reference ``sfg_decoder.py:209-311``).

    ``sample_mask`` additionally zeroes padded rows of the engine's tail batch.
    """
    labels = labels.reshape(-1)
    if positive_only:
        pos_mask = (labels == 1).astype(jnp.float32)
    else:
        pos_mask = jnp.ones_like(labels, dtype=jnp.float32)
    if sample_mask is not None:
        pos_mask = pos_mask * sample_mask.reshape(-1)
    if positive_only:
        num_positive = jnp.sum(pos_mask) + 1e-8
    else:
        num_positive = (
            jnp.sum(sample_mask) if sample_mask is not None else labels.shape[0]
        )

    total_sparse = jnp.zeros(())
    for name, logits in sparse_logits.items():
        targets = sparse_targets[name].reshape(-1)
        logz = jax.nn.logsumexp(logits, axis=-1)
        ll = logz - jnp.take_along_axis(
            logits, targets[:, None], axis=-1
        ).reshape(-1)
        total_sparse = total_sparse + jnp.sum(ll * pos_mask) / num_positive
    total_dense = jnp.zeros(())
    if dense_preds.shape[-1] > 0:
        mse = jnp.mean((dense_preds - dense_targets) ** 2, axis=-1)
        total_dense = jnp.sum(mse * pos_mask) / num_positive
    return sparse_weight * total_sparse + dense_weight * total_dense


def sfg_loss_rows(
    ll_rows: Dict[str, jnp.ndarray],
    dense_preds,
    dense_targets,
    labels,
    sample_mask=None,
    positive_only: bool = True,
    sparse_weight: float = 1.0,
    dense_weight: float = 1.0,
):
    """:func:`sfg_loss` with the per-feature CE already reduced to per-row
    values (the :meth:`SFGDecoder.ce_rows` fused path).  Identical masking and
    normalization semantics (reference ``sfg_decoder.py:240-311``)."""
    labels = labels.reshape(-1)
    if positive_only:
        pos_mask = (labels == 1).astype(jnp.float32)
    else:
        pos_mask = jnp.ones_like(labels, dtype=jnp.float32)
    if sample_mask is not None:
        pos_mask = pos_mask * sample_mask.reshape(-1)
    if positive_only:
        num_positive = jnp.sum(pos_mask) + 1e-8
    else:
        num_positive = (
            jnp.sum(sample_mask) if sample_mask is not None else labels.shape[0]
        )

    # one [F, B] stack + a single masked matvec instead of F separate
    # mask-multiply-reduce passes (each tiny op pays fixed pass overhead on
    # TPU; the per-head loop measured ~0.5 ms of the Pro step, round-4 probe)
    if ll_rows:
        ll_sum = jnp.sum(jnp.stack(list(ll_rows.values()), axis=0), axis=0)
        total_sparse = jnp.vdot(ll_sum, pos_mask) / num_positive
    else:  # dense-only model: no sparse CE heads (matches sfg_loss)
        total_sparse = jnp.zeros(())
    total_dense = jnp.zeros(())
    if dense_preds.shape[-1] > 0:
        mse = jnp.mean((dense_preds - dense_targets) ** 2, axis=-1)
        total_dense = jnp.sum(mse * pos_mask) / num_positive
    return sparse_weight * total_sparse + dense_weight * total_dense


# reference class name (``sfg_decoder.py:209-311``); here the loss is a pure
# function of decoder outputs + targets
SFGLoss = sfg_loss
