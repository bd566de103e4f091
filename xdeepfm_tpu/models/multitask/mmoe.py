"""MMOE (reference: ``deepctr/models/multitask/mmoe.py:17-143``).

Experts run as a batched vmap-style einsum-friendly loop; with few experts a
Python loop over DNN modules is fine (each is an MXU matmul chain) — XLA
parallelizes them inside one program.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basemodel import BaseModel
from ...embeddings import EmbeddingCollection, combined_dnn_input
from ...features import FeatureSchema, compute_input_dim
from ...nn.core import DNN, PredictionLayer, torch_linear_init


class MMOEModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    num_experts: int = 3
    expert_dnn_hidden_units: Tuple[int, ...] = (256, 128)
    gate_dnn_hidden_units: Tuple[int, ...] = (64,)
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
        self.expert_dnn = [
            DNN(
                inputs_dim=input_dim, hidden_units=self.expert_dnn_hidden_units,
                name=f"expert_dnn_{i}", **dnn_kw,
            )
            for i in range(self.num_experts)
        ]
        if len(self.gate_dnn_hidden_units) > 0:
            self.gate_dnn = [
                DNN(
                    inputs_dim=input_dim, hidden_units=self.gate_dnn_hidden_units,
                    name=f"gate_dnn_{i}", **dnn_kw,
                )
                for i in range(num_tasks)
            ]
        self.gate_dnn_final_layer = [
            nn.Dense(
                self.num_experts, use_bias=False, kernel_init=torch_linear_init,
                name=f"gate_final_{i}",
            )
            for i in range(num_tasks)
        ]
        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(
                    inputs_dim=self.expert_dnn_hidden_units[-1],
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
        expert_outs = jnp.stack(
            [e(dnn_input, training=training) for e in self.expert_dnn], axis=1
        )  # [B, K, dim]
        task_outs = []
        for i in range(len(self.task_types)):
            if len(self.gate_dnn_hidden_units) > 0:
                gate_out = self.gate_dnn[i](dnn_input, training=training)
                gate_out = self.gate_dnn_final_layer[i](gate_out)
            else:
                gate_out = self.gate_dnn_final_layer[i](dnn_input)
            gate = nn.softmax(gate_out, axis=1)  # [B, K]
            mmoe_out = jnp.einsum("bk,bkd->bd", gate, expert_outs)
            h = mmoe_out
            if len(self.tower_dnn_hidden_units) > 0:
                h = self.tower_dnn[i](h, training=training)
            logit = self.tower_dnn_final_layer[i](h)
            task_outs.append(self.outs[i](logit))
        return {"pred": jnp.concatenate(task_outs, axis=-1)}


class MMOE(BaseModel):
    def __init__(
        self, dnn_feature_columns, num_experts=3,
        expert_dnn_hidden_units=(256, 128), gate_dnn_hidden_units=(64,),
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
        if num_experts <= 1:
            raise ValueError("num_experts must be greater than 1")
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
        self.num_experts = num_experts
        self.task_names = tuple(task_names)
        self.task_types = tuple(task_types)
        self.expert_dnn_hidden_units = tuple(expert_dnn_hidden_units)
        self.gate_dnn_hidden_units = tuple(gate_dnn_hidden_units)
        self.tower_dnn_hidden_units = tuple(tower_dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        for pat in (
            ("expert_dnn_", "/kernel"),
            ("gate_dnn_", "/kernel"),
            ("gate_final_",),
            ("tower_dnn_", "/kernel"),
            ("tower_final_",),
        ):
            self.add_regularization_weight(pat, l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return MMOEModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            num_experts=self.num_experts,
            expert_dnn_hidden_units=self.expert_dnn_hidden_units,
            gate_dnn_hidden_units=self.gate_dnn_hidden_units,
            tower_dnn_hidden_units=self.tower_dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task_types=self.task_types,
        )
