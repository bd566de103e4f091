"""AutoInt (reference: ``deepctr/models/autoint.py:16-106``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import InteractingLayer


class AutoIntModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
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
        self.int_layers = [
            InteractingLayer(
                embedding_size=self.embedding_size,
                head_num=self.att_head_num,
                use_res=self.att_res,
                name=f"int_layer_{i}",
            )
            for i in range(self.att_layer_num)
        ]
        self.dnn_linear = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, dense_vals = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols
        )
        logit = self.linear_model(batch)
        att_input = sparse_stack
        for layer in self.int_layers:
            att_input = layer(att_input, training=training)
        att_output = att_input.reshape(att_input.shape[0], -1)
        parts = [sparse_stack.reshape(sparse_stack.shape[0], -1)]
        if dense_vals is not None:
            parts.append(dense_vals)
        dnn_input = jnp.concatenate(parts, axis=-1)
        if len(self.dnn_hidden_units) > 0 and self.att_layer_num > 0:
            deep_out = self.dnn(dnn_input, training=training)
            stack_out = jnp.concatenate([att_output, deep_out], axis=-1)
            logit = logit + self.dnn_linear(stack_out)
        elif len(self.dnn_hidden_units) > 0:
            deep_out = self.dnn(dnn_input, training=training)
            logit = logit + self.dnn_linear(deep_out)
        elif self.att_layer_num > 0:
            logit = logit + self.dnn_linear(att_output)
        return {"pred": self.out(logit)}


class AutoInt(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns, att_layer_num=3,
        att_head_num=2, att_res=True, dnn_hidden_units=(256, 128),
        dnn_activation="relu", l2_reg_dnn=0, l2_reg_embedding=1e-5,
        dnn_use_bn=False, dnn_dropout=0, init_std=0.0001, seed=1024,
        task="binary", device=None, gpus=None,
    ):
        # reference passes l2_reg_linear=0 (autoint.py:44)
        super().__init__(
            linear_feature_columns, dnn_feature_columns, l2_reg_linear=0,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task=task, device=device, gpus=gpus,
        )
        if len(dnn_hidden_units) <= 0 and att_layer_num <= 0:
            raise ValueError("Either hidden_layer or att_layer_num must > 0")
        self.att_layer_num = att_layer_num
        self.att_head_num = att_head_num
        self.att_res = att_res
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        if len(dnn_feature_columns) > 0 and len(self.dnn_hidden_units) > 0:
            self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return AutoIntModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            att_layer_num=self.att_layer_num,
            att_head_num=self.att_head_num,
            att_res=self.att_res,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
