"""SharedBottom (reference: ``deepctr/models/multitask/sharedbottom.py:17-104``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basemodel import BaseModel
from ...embeddings import EmbeddingCollection, combined_dnn_input
from ...features import FeatureSchema, compute_input_dim
from ...nn.core import DNN, PredictionLayer, torch_linear_init


class SharedBottomModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    bottom_dnn_hidden_units: Tuple[int, ...] = (256, 128)
    tower_dnn_hidden_units: Tuple[int, ...] = (64,)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    init_std: float = 1e-4
    task_types: Tuple[str, ...] = ("binary", "binary")

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        num_tasks = len(self.task_types)
        input_dim = compute_input_dim(self.dnn_cols)
        dnn_kw = dict(
            activation=self.dnn_activation, dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn, init_std=self.init_std,
        )
        self.bottom_dnn = DNN(
            inputs_dim=input_dim, hidden_units=self.bottom_dnn_hidden_units,
            name="bottom_dnn", **dnn_kw,
        )
        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(
                    inputs_dim=self.bottom_dnn_hidden_units[-1],
                    hidden_units=self.tower_dnn_hidden_units,
                    name=f"tower_dnn_{i}", **dnn_kw,
                )
                for i in range(num_tasks)
            ]
        self.tower_dnn_final_layer = [
            nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init,
                name=f"tower_final_{i}",
            )
            for i in range(num_tasks)
        ]
        self.outs = [
            PredictionLayer(task=t, name=f"out_{i}")
            for i, t in enumerate(self.task_types)
        ]

    def __call__(self, batch, training: bool = False):
        sparse_list, dense_list = self.embedding_dict.fast_inputs(
            batch, self.dnn_cols
        )
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        shared = self.bottom_dnn(dnn_input, training=training)
        task_outs = []
        for i in range(len(self.task_types)):
            h = shared
            if len(self.tower_dnn_hidden_units) > 0:
                h = self.tower_dnn[i](h, training=training)
            logit = self.tower_dnn_final_layer[i](h)
            task_outs.append(self.outs[i](logit))
        return {"pred": jnp.concatenate(task_outs, axis=-1)}


class SharedBottom(BaseModel):
    def __init__(
        self, dnn_feature_columns, bottom_dnn_hidden_units=(256, 128),
        tower_dnn_hidden_units=(64,), l2_reg_linear=0.00001,
        l2_reg_embedding=0.00001, l2_reg_dnn=0, init_std=0.0001, seed=1024,
        dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False,
        task_types=("binary", "binary"), task_names=("ctr", "ctcvr"),
        device=None, gpus=None,
    ):
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=l2_reg_linear,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            device=device, gpus=gpus,
        )
        self.num_tasks = len(task_names)
        if self.num_tasks <= 1:
            raise ValueError("num_tasks must be greater than 1")
        if len(dnn_feature_columns) == 0:
            raise ValueError("dnn_feature_columns is null!")
        if len(task_types) != self.num_tasks:
            raise ValueError("num_tasks must be equal to the length of task_types")
        for task_type in task_types:
            if task_type not in ["binary", "regression"]:
                raise ValueError(
                    "task must be binary or regression, {} is illegal".format(
                        task_type
                    )
                )
        self.task_names = tuple(task_names)
        self.task_types = tuple(task_types)
        self.bottom_dnn_hidden_units = tuple(bottom_dnn_hidden_units)
        self.tower_dnn_hidden_units = tuple(tower_dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        self.add_regularization_weight(("bottom_dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("tower_dnn_", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("tower_final_",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return SharedBottomModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            bottom_dnn_hidden_units=self.bottom_dnn_hidden_units,
            tower_dnn_hidden_units=self.tower_dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task_types=self.task_types,
        )
