"""DIEN (reference: ``deepctr/models/dien.py:16-381``).

InterestExtractor (GRU + optional negative-sampling auxiliary loss) →
InterestEvolving (GRU / AIGRU / AGRU / AUGRU with attention) → DNN.

The reference compacts the batch with ``masked_select`` (rows with
keys_length > 0) before packing sequences — a dynamic-shape op.  Here
everything is computed statically over the full batch with masks; rows with
length 0 produce exactly the reference's ``zero_outputs`` because the scan
hidden state starts at 0 and never updates.  The extractor :class:`GRU`
zeroes its padded outputs (matching ``pad_packed_sequence(padding_value=
0.0)``); the evolution :class:`DynamicGRU` instead FREEZES the hidden state
past each row's length, which is observationally identical here because only
the last valid state is consumed (``outs_t[-1]`` — that is why the frozen
convention exists; reference ``_get_last_state``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, combined_dnn_input
from ..features import DenseFeat, FeatureSchema, SparseFeat, VarLenSparseFeat
from ..nn.core import DNN, PredictionLayer
from ..nn.sequence import (
    GRU,
    AttentionSequencePoolingLayer,
    DynamicGRU,
)


class InterestExtractor(nn.Module):
    """GRU over behavior sequence + auxiliary click/no-click loss
    (reference ``dien.py:181-274``)."""

    input_size: int
    use_neg: bool = False
    init_std: float = 0.001

    def setup(self):
        self.gru = GRU(
            input_size=self.input_size, hidden_size=self.input_size,
            init_std=self.init_std, name="gru",
        )
        if self.use_neg:
            self.auxiliary_net = DNN(
                inputs_dim=self.input_size * 2, hidden_units=(100, 50, 1),
                activation="sigmoid", init_std=self.init_std,
                name="auxiliary_net",
            )

    def __call__(self, keys_t, keys_length, neg_keys_t=None, training=False):
        """keys_t [T, H, B] (transposed lane space — see DIENModule).
        Returns (FROZEN interests_t [T, H, B], aux_loss)."""
        interests_t, _ = self.gru.call_t(keys_t, keys_length.reshape(-1))
        aux_loss = jnp.zeros(())
        if self.use_neg and neg_keys_t is not None:
            aux_loss = self._cal_auxiliary_loss_t(
                interests_t[:-1],
                keys_t[1:],
                neg_keys_t[1:],
                keys_length.reshape(-1) - 1,
                training,
            )
        return interests_t, aux_loss

    def _cal_auxiliary_loss_t(self, states_t, click_t, noclick_t, lengths,
                              training):
        # states/click/noclick [T', 2H-concat pieces, B]; the MLP runs in the
        # transposed layout so its ~20-100-wide activations never pad to 128
        # lanes (CLAUDE.md layout playbook; positions past each row's length
        # are masked out of the loss, so frozen/garbage values there are fine)
        T1 = states_t.shape[0]
        mask = (
            jnp.arange(T1)[:, None] < lengths[None, :]
        ).astype(jnp.float32)[:, None, :]  # [T', 1, B]
        click_in = jnp.concatenate([states_t, click_t], axis=1)
        noclick_in = jnp.concatenate([states_t, noclick_t], axis=1)
        click_p = self.auxiliary_net.call_t(click_in, training=training)
        noclick_p = self.auxiliary_net.call_t(noclick_in, training=training)
        eps = 1e-7
        click_ll = -jnp.log(jnp.clip(click_p, eps, 1 - eps))
        noclick_ll = -jnp.log(jnp.clip(1 - noclick_p, eps, 1 - eps))
        n_valid = jnp.maximum(jnp.sum(mask), 1.0)
        # F.binary_cross_entropy mean over concat(click, noclick) selections
        return (jnp.sum(click_ll * mask) + jnp.sum(noclick_ll * mask)) / (
            2.0 * n_valid
        )


class InterestEvolving(nn.Module):
    """Reference ``dien.py:276-381``."""

    input_size: int
    gru_type: str = "GRU"
    use_neg: bool = False
    init_std: float = 0.001
    att_hidden_size: Tuple[int, ...] = (64, 16)
    att_activation: str = "sigmoid"
    att_weight_normalization: bool = False

    def setup(self):
        if self.gru_type not in ["GRU", "AIGRU", "AGRU", "AUGRU"]:
            raise NotImplementedError(
                "gru_type: {gru_type} is not supported"
            )
        return_score = self.gru_type != "GRU"
        self.attention = AttentionSequencePoolingLayer(
            embedding_dim=self.input_size,
            att_hidden_units=self.att_hidden_size,
            att_activation=self.att_activation,
            weight_normalization=self.att_weight_normalization,
            return_score=return_score,
            name="attention",
        )
        if self.gru_type in ("GRU", "AIGRU"):
            self.interest_evolution = GRU(
                input_size=self.input_size, hidden_size=self.input_size,
                init_std=self.init_std, name="interest_evolution",
            )
        else:
            self.interest_evolution = DynamicGRU(
                input_size=self.input_size, hidden_size=self.input_size,
                gru_type=self.gru_type, init_std=self.init_std,
                name="interest_evolution",
            )

    def __call__(self, query, keys_t, keys_length, training=False):
        # query [B, H], keys_t [T, H, B] (frozen extractor output),
        # keys_length [B, 1].  Runs in the transposed lane space end to end
        # when the attention MLP supports it; falls back to batch-major
        # otherwise (e.g. Dice activation).
        T = keys_t.shape[0]
        lengths = keys_length.reshape(-1)
        valid_row = (lengths > 0).astype(query.dtype)[:, None]
        if self.attention.local_att.supports_transposed:
            query_t = query.T  # [H, B]
            if self.gru_type == "GRU":
                outs2_t, _ = self.interest_evolution.call_t(keys_t, lengths)
                scores_t = self.attention.scores_t(
                    query_t, outs2_t, lengths, training=training
                )  # [T, 1, B]
                outputs = jnp.sum(scores_t * outs2_t, axis=0).T  # [B, H]
            elif self.gru_type == "AIGRU":
                scores_t = self.attention.scores_t(
                    query_t, keys_t, lengths, training=training
                )
                _, h_last = self.interest_evolution.call_t(
                    keys_t * scores_t, lengths
                )
                outputs = h_last.T
            else:  # AGRU / AUGRU
                scores_t = self.attention.scores_t(
                    query_t, keys_t, lengths, training=training
                )
                states_t = self.interest_evolution.call_t(
                    keys_t, scores_t, lengths
                )
                # frozen recurrence => last slice is each row's final state
                outputs = states_t[-1].T
            return outputs * valid_row

        keys = jnp.transpose(keys_t, (2, 0, 1))  # [B, T, H] fallback
        q3 = query[:, None, :]
        if self.gru_type == "GRU":
            interests, _ = self.interest_evolution(keys, lengths)
            outputs = self.attention(
                q3, interests, keys_length, training=training
            )[:, 0, :]
        elif self.gru_type == "AIGRU":
            att_scores = self.attention(
                q3, keys, keys_length, training=training
            )  # [B, 1, T]
            interests = keys * jnp.swapaxes(att_scores, 1, 2)
            _, outputs = self.interest_evolution(interests, lengths)
        else:  # AGRU / AUGRU
            att_scores = self.attention(
                q3, keys, keys_length, training=training
            )[:, 0, :]  # [B, T]
            states = self.interest_evolution(keys, att_scores, lengths)
            # pick last valid state (length-1); zero row when length == 0
            idx = jnp.clip(lengths - 1, 0, T - 1)
            outputs = jnp.take_along_axis(
                states, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]
        return outputs * valid_row  # zero_outputs for empty rows


class DIENModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    history_feature_list: Tuple[str, ...]
    interest_dim: int
    gru_type: str = "GRU"
    use_negsampling: bool = False
    alpha: float = 1.0
    use_bn: bool = False
    dnn_hidden_units: Tuple[int, ...] = (256, 128)
    dnn_activation: str = "relu"
    att_hidden_units: Tuple[int, ...] = (64, 16)
    att_activation: str = "relu"
    att_weight_normalization: bool = True
    dnn_dropout: float = 0.0
    init_std: float = 1e-4
    seed: int = 1024
    task: str = "binary"

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        sp = [f for f in self.dnn_cols if isinstance(f, SparseFeat)]
        vl = [f for f in self.dnn_cols if isinstance(f, VarLenSparseFeat)]
        de = [f for f in self.dnn_cols if isinstance(f, DenseFeat)]
        self._sparse_cols = tuple(sp)
        self._dense_cols = tuple(de)
        hist_names = ["hist_" + x for x in self.history_feature_list]
        neg_names = ["neg_" + x for x in hist_names]
        self._history_cols = tuple(f for f in vl if f.name in hist_names)
        self._neg_history_cols = tuple(f for f in vl if f.name in neg_names)
        self._other_varlen_cols = tuple(
            f
            for f in vl
            if f.name not in hist_names and f.name not in neg_names
        )
        self._length_name = next(
            (f.length_name for f in vl if f.length_name is not None), None
        )
        if self._length_name is None:
            raise ValueError(
                "please add max length column for VarLenSparseFeat of DIN/DIEN "
                "input"
            )
        self.interest_extractor = InterestExtractor(
            input_size=self.interest_dim, use_neg=self.use_negsampling,
            init_std=self.init_std, name="interest_extractor",
        )
        self.interest_evolution = InterestEvolving(
            input_size=self.interest_dim,
            gru_type=self.gru_type,
            use_neg=self.use_negsampling,
            init_std=self.init_std,
            att_hidden_size=self.att_hidden_units,
            att_activation=self.att_activation.lower()
            if isinstance(self.att_activation, str)
            else self.att_activation,
            att_weight_normalization=self.att_weight_normalization,
            name="interest_evolution",
        )
        dnn_input_size = (
            sum(f.embedding_dim for f in sp)
            + sum(f.dimension for f in de)
            + self.interest_dim
        )
        self.dnn = DNN(
            inputs_dim=dnn_input_size,
            hidden_units=self.dnn_hidden_units,
            activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout,
            use_bn=self.use_bn,
            init_std=self.init_std,
            seed=self.seed,
            name="dnn",
        )
        self.linear = nn.Dense(
            1,
            use_bias=False,
            kernel_init=nn.initializers.normal(stddev=self.init_std),
            name="linear",
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        query_emb = jnp.concatenate(
            [
                self.embedding_dict.lookup_sparse(batch, f)
                for f in self._sparse_cols
                if f.name in self.history_feature_list
            ],
            axis=-1,
        )[:, 0, :]  # [B, H]
        keys_emb = jnp.concatenate(
            [
                self.embedding_dict.lookup_varlen_seq(batch, f)
                for f in self._history_cols
            ],
            axis=-1,
        )  # [B, T, H]
        keys_length = batch["len_" + self._length_name]  # [B, 1]
        if self.use_negsampling and self._neg_history_cols:
            neg_keys_emb = jnp.concatenate(
                [
                    self.embedding_dict.lookup_varlen_seq(batch, f)
                    for f in self._neg_history_cols
                ],
                axis=-1,
            )
        else:
            neg_keys_emb = None

        # one relayout into transposed lane space [T, H, B]; the whole
        # extractor/aux/attention/evolution interior then runs lane-packed
        # (no [B, T, H<=16] tensor whose lane padding costs 13-26x HBM bytes)
        keys_t = jnp.transpose(keys_emb, (1, 2, 0))
        neg_keys_t = (
            jnp.transpose(neg_keys_emb, (1, 2, 0))
            if neg_keys_emb is not None
            else None
        )
        interest_t, aux_loss = self.interest_extractor(
            keys_t, keys_length, neg_keys_t, training=training
        )
        hist = self.interest_evolution(
            query_emb, interest_t, keys_length, training=training
        )  # [B, H]
        deep_input_emb = jnp.concatenate(
            [
                self.embedding_dict.lookup_sparse(batch, f)[:, 0, :]
                for f in self._sparse_cols
            ],
            axis=-1,
        )
        deep_input_emb = jnp.concatenate([hist, deep_input_emb], axis=-1)
        dense_list = [
            batch["dense"][:, slice(*self.schema.dense_slice(f.name))]
            for f in self._dense_cols
        ]
        dnn_input = combined_dnn_input([deep_input_emb[:, None, :]], dense_list)
        output = self.linear(self.dnn(dnn_input, training=training))
        return {"pred": self.out(output), "aux_loss": aux_loss * self.alpha}


class DIEN(BaseModel):
    def __init__(
        self, dnn_feature_columns, history_feature_list, gru_type="GRU",
        use_negsampling=False, alpha=1.0, use_bn=False,
        dnn_hidden_units=(256, 128), dnn_activation="relu",
        att_hidden_units=(64, 16), att_activation="relu",
        att_weight_normalization=True, l2_reg_dnn=0, l2_reg_embedding=1e-6,
        dnn_dropout=0, init_std=0.0001, seed=1024, task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=0,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task=task, device=device, gpus=gpus,
        )
        self.history_feature_list = tuple(history_feature_list)
        self.gru_type = gru_type
        self.use_negsampling = use_negsampling
        self.alpha = alpha
        self.use_bn = use_bn
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_activation = dnn_activation
        self.att_hidden_units = tuple(att_hidden_units)
        self.att_activation = att_activation
        self.att_weight_normalization = att_weight_normalization
        self.dnn_dropout = dnn_dropout
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        interest_dim = sum(
            f.embedding_dim
            for f in self.dnn_feature_columns
            if isinstance(f, SparseFeat) and f.name in self.history_feature_list
        )
        return DIENModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            history_feature_list=self.history_feature_list,
            interest_dim=interest_dim,
            gru_type=self.gru_type,
            use_negsampling=self.use_negsampling,
            alpha=self.alpha,
            use_bn=self.use_bn,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_activation=self.dnn_activation,
            att_hidden_units=self.att_hidden_units,
            att_activation=self.att_activation,
            att_weight_normalization=self.att_weight_normalization,
            dnn_dropout=self.dnn_dropout,
            init_std=self.init_std,
            seed=self.seed,
            task=self.task,
        )
