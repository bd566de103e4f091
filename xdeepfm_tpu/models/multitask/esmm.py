"""ESMM (reference: ``deepctr/models/multitask/esmm.py:17-94``).
Outputs [ctr, ctcvr] with ctcvr = ctr * cvr (``esmm.py:91``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basemodel import BaseModel
from ...embeddings import EmbeddingCollection, combined_dnn_input
from ...features import FeatureSchema, compute_input_dim
from ...nn.core import DNN, PredictionLayer, torch_linear_init


class ESMMModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    tower_dnn_hidden_units: Tuple[int, ...] = (256, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    init_std: float = 1e-4

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        input_dim = compute_input_dim(self.dnn_cols)
        dnn_kw = dict(
            activation=self.dnn_activation, dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn, init_std=self.init_std,
        )
        self.ctr_dnn = DNN(
            inputs_dim=input_dim, hidden_units=self.tower_dnn_hidden_units,
            name="ctr_dnn", **dnn_kw,
        )
        self.cvr_dnn = DNN(
            inputs_dim=input_dim, hidden_units=self.tower_dnn_hidden_units,
            name="cvr_dnn", **dnn_kw,
        )
        self.ctr_dnn_final_layer = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init,
            name="ctr_final",
        )
        self.cvr_dnn_final_layer = nn.Dense(
            1, use_bias=False, kernel_init=torch_linear_init,
            name="cvr_final",
        )
        self.out = PredictionLayer(task="binary", name="out")

    def __call__(self, batch, training: bool = False):
        sparse_list, dense_list = self.embedding_dict.fast_inputs(
            batch, self.dnn_cols
        )
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        ctr_logit = self.ctr_dnn_final_layer(
            self.ctr_dnn(dnn_input, training=training)
        )
        cvr_logit = self.cvr_dnn_final_layer(
            self.cvr_dnn(dnn_input, training=training)
        )
        ctr_pred = self.out(ctr_logit)
        cvr_pred = self.out(cvr_logit)
        ctcvr_pred = ctr_pred * cvr_pred
        return {"pred": jnp.concatenate([ctr_pred, ctcvr_pred], axis=-1)}


class ESMM(BaseModel):
    def __init__(
        self, dnn_feature_columns, tower_dnn_hidden_units=(256, 128),
        l2_reg_linear=0.00001, l2_reg_embedding=0.00001, l2_reg_dnn=0,
        init_std=0.0001, seed=1024, dnn_dropout=0, dnn_activation="relu",
        dnn_use_bn=False, task_types=("binary", "binary"),
        task_names=("ctr", "ctcvr"), device=None, gpus=None,
    ):
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=l2_reg_linear,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task="binary", device=device, gpus=gpus,
        )
        self.num_tasks = len(task_names)
        if self.num_tasks != 2:
            raise ValueError("the length of task_names must be equal to 2")
        if len(dnn_feature_columns) == 0:
            raise ValueError("dnn_feature_columns is null!")
        if len(task_types) != self.num_tasks:
            raise ValueError("num_tasks must be equal to the length of task_types")
        for task_type in task_types:
            if task_type != "binary":
                raise ValueError(
                    "task must be binary in ESMM, {} is illegal".format(task_type)
                )
        self.tower_dnn_hidden_units = tuple(tower_dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        self.add_regularization_weight(("ctr_dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("cvr_dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("ctr_final/",), l2=l2_reg_dnn)
        self.add_regularization_weight(("cvr_final/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return ESMMModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            tower_dnn_hidden_units=self.tower_dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
        )
