"""Wide & Deep (reference: ``deepctr/models/wdl.py:16-75``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel, combined_dnn_input
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init


class WDLModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    dnn_hidden_units: Tuple[int, ...] = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
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
        self.use_dnn = len(self.dnn_cols) > 0 and len(self.dnn_hidden_units) > 0
        if self.use_dnn:
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
        sparse_list, dense_list = self.embedding_dict.fast_inputs(
            batch, self.dnn_cols
        )
        logit = self.linear_model(batch)
        if self.use_dnn:
            dnn_input = combined_dnn_input(sparse_list, dense_list)
            dnn_out = self.dnn(dnn_input, training=training)
            logit = logit + self.dnn_linear(dnn_out)
        return {"pred": self.out(logit)}


class WDL(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(256, 128), l2_reg_linear=1e-5, l2_reg_embedding=1e-5,
        l2_reg_dnn=0, init_std=0.0001, seed=1024, dnn_dropout=0,
        dnn_activation="relu", dnn_use_bn=False, task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        if len(dnn_feature_columns) > 0 and len(self.dnn_hidden_units) > 0:
            self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
            self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return WDLModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
