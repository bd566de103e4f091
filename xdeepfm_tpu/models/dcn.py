"""DCN (reference: ``deepctr/models/dcn.py:20-96``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel, combined_dnn_input
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import CrossNet


class DCNModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    cross_num: int = 2
    cross_parameterization: str = "vector"
    dnn_hidden_units: Tuple[int, ...] = (128, 128)
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
        in_dim = compute_input_dim(self.dnn_cols)
        self.dnn = DNN(
            inputs_dim=in_dim,
            hidden_units=self.dnn_hidden_units,
            activation=self.dnn_activation,
            use_bn=self.dnn_use_bn,
            dropout_rate=self.dnn_dropout,
            init_std=self.init_std,
            name="dnn",
        )
        self.crossnet = CrossNet(
            in_features=in_dim,
            layer_num=self.cross_num,
            parameterization=self.cross_parameterization,
            name="crossnet",
        )
        self.dnn_linear = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        logit = self.linear_model(batch)
        sparse_list, dense_list = self.embedding_dict.fast_inputs(
            batch, self.dnn_cols
        )
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        if len(self.dnn_hidden_units) > 0 and self.cross_num > 0:
            deep_out = self.dnn(dnn_input, training=training)
            cross_out = self.crossnet(dnn_input)
            stack_out = jnp.concatenate([cross_out, deep_out], axis=-1)
            logit = logit + self.dnn_linear(stack_out)
        elif len(self.dnn_hidden_units) > 0:
            logit = logit + self.dnn_linear(self.dnn(dnn_input, training=training))
        elif self.cross_num > 0:
            logit = logit + self.dnn_linear(self.crossnet(dnn_input))
        return {"pred": self.out(logit)}


class DCN(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns, cross_num=2,
        cross_parameterization="vector", dnn_hidden_units=(128, 128),
        l2_reg_linear=0.00001, l2_reg_embedding=0.00001, l2_reg_cross=0.00001,
        l2_reg_dnn=0, init_std=0.0001, seed=1024, dnn_dropout=0,
        dnn_activation="relu", dnn_use_bn=False, task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task=task, device=device, gpus=gpus,
        )
        self.cross_num = cross_num
        self.cross_parameterization = cross_parameterization
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_linear)
        self.add_regularization_weight(("crossnet/kernels",), l2=l2_reg_cross)
        self._finalize()

    def _build_module(self):
        return DCNModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            cross_num=self.cross_num,
            cross_parameterization=self.cross_parameterization,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
