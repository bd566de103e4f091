"""NFM (reference: ``deepctr/models/nfm.py:16-78``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import BiInteractionPooling


class NFMModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    dnn_hidden_units: Tuple[int, ...] = (128, 128)
    bi_dropout: float = 0.0
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    init_std: float = 1e-4
    task: str = "binary"

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        self.linear_model = LinearModel(
            feature_columns=self.linear_cols, schema=self.schema,
            init_std=self.init_std, name="linear_model",
        )
        self.dnn = DNN(
            inputs_dim=compute_input_dim(self.dnn_cols, include_sparse=False)
            + self.embedding_size,
            hidden_units=self.dnn_hidden_units,
            activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout,
            use_bn=False,
            init_std=self.init_std,
            name="dnn",
        )
        self.dnn_linear = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
        )
        self.bi_pooling = BiInteractionPooling(name="bi_pooling")
        self.dropout = nn.Dropout(rate=self.bi_dropout)
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, dense_vals = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols
        )
        linear_logit = self.linear_model(batch)
        bi_out = self.bi_pooling(sparse_stack)
        if self.bi_dropout > 0:
            bi_out = self.dropout(bi_out, deterministic=not training)
        parts = [bi_out.reshape(bi_out.shape[0], -1)]
        if dense_vals is not None:
            parts.append(dense_vals)
        dnn_out = self.dnn(jnp.concatenate(parts, axis=-1), training=training)
        logit = linear_logit + self.dnn_linear(dnn_out)
        return {"pred": self.out(logit)}


class NFM(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(128, 128), l2_reg_embedding=1e-5, l2_reg_linear=1e-5,
        l2_reg_dnn=0, init_std=0.0001, seed=1024, bi_dropout=0, dnn_dropout=0,
        dnn_activation="relu", task="binary", device=None, gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.bi_dropout = bi_dropout
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return NFMModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            dnn_hidden_units=self.dnn_hidden_units,
            bi_dropout=self.bi_dropout,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            init_std=self.init_std,
            task=self.task,
        )
