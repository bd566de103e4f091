"""DIN (reference: ``deepctr/models/din.py:15-130``).

Behavior-sequence attention over varlen ``hist_*`` features; no linear term.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, combined_dnn_input
from ..features import (
    DenseFeat,
    FeatureSchema,
    SparseFeat,
    VarLenSparseFeat,
    compute_input_dim,
)
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.sequence import AttentionSequencePoolingLayer


class DINModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    history_feature_list: Tuple[str, ...]
    att_emb_dim: int
    dnn_use_bn: bool = False
    dnn_hidden_units: Tuple[int, ...] = (256, 128)
    dnn_activation: str = "relu"
    att_hidden_size: Tuple[int, ...] = (64, 16)
    att_activation: str = "dice"
    att_weight_normalization: bool = False
    dnn_dropout: float = 0.0
    init_std: float = 1e-4
    task: str = "binary"

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        sp = [f for f in self.dnn_cols if isinstance(f, SparseFeat)]
        vl = [f for f in self.dnn_cols if isinstance(f, VarLenSparseFeat)]
        hist_names = ["hist_" + x for x in self.history_feature_list]
        self._sparse_cols = tuple(sp)
        self._history_cols = tuple(f for f in vl if f.name in hist_names)
        self._other_varlen_cols = tuple(f for f in vl if f.name not in hist_names)
        self._hist_names = tuple(hist_names)
        self.attention = AttentionSequencePoolingLayer(
            att_hidden_units=self.att_hidden_size,
            embedding_dim=self.att_emb_dim,
            att_activation=self.att_activation,
            return_score=False,
            supports_masking=False,
            weight_normalization=self.att_weight_normalization,
            name="attention",
        )
        self.dnn = DNN(
            inputs_dim=compute_input_dim(self.dnn_cols),
            hidden_units=self.dnn_hidden_units,
            activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            name="dnn",
        )
        self.dnn_linear = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        # query: sparse feats named in history_feature_list, concat over emb dim
        query_emb = jnp.concatenate(
            [
                self.embedding_dict.lookup_sparse(batch, f)
                for f in self._sparse_cols
                if f.name in self.history_feature_list
            ],
            axis=-1,
        )  # [B, 1, E]
        keys_emb = jnp.concatenate(
            [
                self.embedding_dict.lookup_varlen_seq(batch, f)
                for f in self._history_cols
            ],
            axis=-1,
        )  # [B, T, E]
        length_names = [
            f.length_name for f in self._history_cols if f.length_name is not None
        ] + [
            f.length_name
            for f in self._other_varlen_cols
            if f.length_name is not None
        ]
        if not length_names:
            raise ValueError(
                "please add max length column for VarLenSparseFeat of DIN/DIEN "
                "input"
            )
        keys_length = batch["len_" + length_names[0]]  # [B, 1]

        hist = self.attention(
            query_emb, keys_emb, keys_length, training=training
        )  # [B, 1, E]

        dnn_input_emb_list = [
            self.embedding_dict.lookup_sparse(batch, f) for f in self._sparse_cols
        ]
        dnn_input_emb_list += [
            self.embedding_dict.lookup_varlen_pooled(batch, f)
            for f in self._other_varlen_cols
        ]
        deep_input_emb = jnp.concatenate(dnn_input_emb_list + [hist], axis=-1)
        deep_input_emb = deep_input_emb.reshape(deep_input_emb.shape[0], -1)
        de = [f for f in self.dnn_cols if isinstance(f, DenseFeat)]
        dense_list = [
            batch["dense"][:, slice(*self.schema.dense_slice(f.name))] for f in de
        ]
        dnn_input = combined_dnn_input([deep_input_emb[:, None, :]], dense_list)
        dnn_output = self.dnn(dnn_input, training=training)
        return {"pred": self.out(self.dnn_linear(dnn_output))}


class DIN(BaseModel):
    def __init__(
        self, dnn_feature_columns, history_feature_list, dnn_use_bn=False,
        dnn_hidden_units=(256, 128), dnn_activation="relu",
        att_hidden_size=(64, 16), att_activation="Dice",
        att_weight_normalization=False, l2_reg_dnn=0.0, l2_reg_embedding=1e-6,
        dnn_dropout=0, init_std=0.0001, seed=1024, task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=0,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task=task, device=device, gpus=gpus,
        )
        self.history_feature_list = tuple(history_feature_list)
        self.dnn_use_bn = dnn_use_bn
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_activation = dnn_activation
        self.att_hidden_size = tuple(att_hidden_size)
        self.att_activation = att_activation
        self.att_weight_normalization = att_weight_normalization
        self.dnn_dropout = dnn_dropout
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        att_emb_dim = sum(
            f.embedding_dim
            for f in self.dnn_feature_columns
            if isinstance(f, SparseFeat) and f.name in self.history_feature_list
        )
        return DINModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            history_feature_list=self.history_feature_list,
            att_emb_dim=att_emb_dim,
            dnn_use_bn=self.dnn_use_bn,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_activation=self.dnn_activation,
            att_hidden_size=self.att_hidden_size,
            att_activation=self.att_activation.lower()
            if isinstance(self.att_activation, str)
            else self.att_activation,
            att_weight_normalization=self.att_weight_normalization,
            dnn_dropout=self.dnn_dropout,
            init_std=self.init_std,
            task=self.task,
        )
