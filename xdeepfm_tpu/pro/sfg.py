"""Supervised Feature Generation (reference: ``deepctr/xdeepfm_pro/sfg_decoder.py``).

Decoder reconstructs the input features from embeddings with a label-aware,
positive-masked reconstruction loss — the fork author's anti-embedding-collapse
mechanism (SURVEY.md §0).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.core import torch_bias_init, torch_linear_init


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
        label_emb = jnp.take(label_table, labels, axis=0)
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


class SFGDecoder(nn.Module):
    """Shared MLP -> per-sparse-feature softmax heads + one dense regression
    head (reference ``sfg_decoder.py:19-157``).

    Input: sparse embeddings [B, F, E], dense values [B, D], labels [B, 1].
    Returns (sparse_logits dict, dense_preds [B, D]).
    """

    embedding_dim: int
    sparse_vocab_sizes: Tuple[Tuple[str, int], ...]  # ordered (name, vocab)
    num_dense: int
    hidden_units: Tuple[int, ...] = (128, 64)
    dropout_rate: float = 0.1
    use_label_aware_attention: bool = True

    @nn.compact
    def __call__(self, sparse_embeddings, dense_values, labels=None,
                 training: bool = False):
        B = sparse_embeddings.shape[0]
        sparse_concat = sparse_embeddings.reshape(B, -1)
        decoder_input = jnp.concatenate([sparse_concat, dense_values], axis=-1)
        input_dim = decoder_input.shape[-1]

        if self.use_label_aware_attention and labels is not None:
            gate = LabelAwareAttention(
                input_dim=input_dim,
                hidden_dim=self.hidden_units[0] if self.hidden_units else 64,
                name="label_attention",
            )(decoder_input, labels)
            decoder_input = decoder_input * gate

        h = decoder_input
        prev = input_dim
        for i, units in enumerate(self.hidden_units):
            h = nn.Dense(
                units,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(prev),
                name=f"shared_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(rate=self.dropout_rate)(h, deterministic=not training)
            prev = units

        sparse_logits = {}
        for name, vocab in self.sparse_vocab_sizes:
            sparse_logits[name] = nn.Dense(
                vocab,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(prev),
                name=f"head_{name}",
            )(h)
        if self.num_dense > 0:
            dense_preds = nn.Dense(
                self.num_dense,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(prev),
                name="dense_head",
            )(h)
        else:
            dense_preds = jnp.zeros((B, 0))
        return sparse_logits, dense_preds


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


# reference class name (``sfg_decoder.py:209-311``); here the loss is a pure
# function of decoder outputs + targets
SFGLoss = sfg_loss
