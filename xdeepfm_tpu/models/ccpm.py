"""CCPM (reference: ``deepctr/models/ccpm.py:21-83``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import ConvLayer


class CCPMModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    field_size: int
    embedding_size: int
    conv_kernel_width: Tuple[int, ...] = (6, 5)
    conv_filters: Tuple[int, ...] = (4, 4)
    dnn_hidden_units: Tuple[int, ...] = (256,)
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
        self.conv_layer = ConvLayer(
            field_size=self.field_size,
            conv_kernel_width=self.conv_kernel_width,
            conv_filters=self.conv_filters,
            name="conv_layer",
        )
        filed_shape = ConvLayer.output_field_size(
            self.field_size, len(self.conv_filters)
        )
        self.dnn = DNN(
            inputs_dim=filed_shape * self.embedding_size * self.conv_filters[-1],
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
        linear_logit = self.linear_model(batch)
        sparse_stack, _ = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols, support_dense=False
        )
        if sparse_stack is None:
            raise ValueError(
                "must have the embedding feature,now the embedding feature is "
                "None!"
            )
        # torch uses NCHW [B,1,F,E]; NHWC [B,F,E,1] is TPU-native.
        conv_input = sparse_stack[:, :, :, None]
        pooling_result = self.conv_layer(conv_input)
        flat = pooling_result.reshape(pooling_result.shape[0], -1)
        dnn_out = self.dnn(flat, training=training)
        logit = linear_logit + self.dnn_linear(dnn_out)
        return {"pred": self.out(logit)}


class CCPM(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        conv_kernel_width=(6, 5), conv_filters=(4, 4), dnn_hidden_units=(256,),
        l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0, dnn_dropout=0,
        init_std=0.0001, seed=1024, task="binary", device=None, dnn_use_bn=False,
        dnn_activation="relu", gpus=None,
    ):
        if len(conv_kernel_width) != len(conv_filters):
            raise ValueError(
                "conv_kernel_width must have same element with conv_filters"
            )
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.conv_kernel_width = tuple(conv_kernel_width)
        self.conv_filters = tuple(conv_filters)
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_use_bn = dnn_use_bn
        self.dnn_activation = dnn_activation
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        field_size = self.compute_input_dim(
            self.dnn_feature_columns, include_dense=False, feature_group=True
        )
        return CCPMModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            field_size=field_size,
            embedding_size=self.embedding_size,
            conv_kernel_width=self.conv_kernel_width,
            conv_filters=self.conv_filters,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
