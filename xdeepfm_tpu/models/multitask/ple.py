"""PLE / CGC (reference: ``deepctr/models/multitask/ple.py:17-219``).

Mirrors the reference exactly, including its quirk of building the shared
expert list with ``specific_expert_num`` modules (``ple.py:87-88``) while
iterating ``shared_expert_num`` in forward.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basemodel import BaseModel
from ...embeddings import EmbeddingCollection, combined_dnn_input
from ...features import FeatureSchema, compute_input_dim
from ...nn.core import DNN, PredictionLayer, torch_linear_init


class PLEModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    shared_expert_num: int = 1
    specific_expert_num: int = 1
    num_levels: int = 2
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
        exp_dim = self.expert_dnn_hidden_units[-1]
        dnn_kw = dict(
            activation=self.dnn_activation, dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn, init_std=self.init_std,
        )

        def expert_grid(prefix, n_groups, n_experts, hidden):
            return [
                [
                    [
                        DNN(
                            inputs_dim=input_dim if level == 0 else exp_dim,
                            hidden_units=hidden,
                            name=f"{prefix}_{level}_{g}_{e}", **dnn_kw,
                        )
                        for e in range(n_experts)
                    ]
                    for g in range(n_groups)
                ]
                for level in range(self.num_levels)
            ]

        self.specific_experts = expert_grid(
            "specific_expert", num_tasks, self.specific_expert_num,
            self.expert_dnn_hidden_units,
        )
        self.shared_experts = expert_grid(
            "shared_expert", 1, self.specific_expert_num,
            self.expert_dnn_hidden_units,
        )
        specific_gate_out = self.specific_expert_num + self.shared_expert_num
        shared_gate_out = num_tasks * self.specific_expert_num + self.shared_expert_num
        if len(self.gate_dnn_hidden_units) > 0:
            self.specific_gate_dnn = expert_grid(
                "specific_gate_dnn", num_tasks, 1, self.gate_dnn_hidden_units
            )
            self.shared_gate_dnn = [
                DNN(
                    inputs_dim=input_dim if level == 0 else exp_dim,
                    hidden_units=self.gate_dnn_hidden_units,
                    name=f"shared_gate_dnn_{level}", **dnn_kw,
                )
                for level in range(self.num_levels)
            ]
        gate_in = (
            self.gate_dnn_hidden_units[-1]
            if len(self.gate_dnn_hidden_units) > 0
            else None
        )
        self.specific_gate_final = [
            [
                nn.Dense(
                    specific_gate_out, use_bias=False,
                    kernel_init=torch_linear_init,
                    name=f"specific_gate_final_{level}_{i}",
                )
                for i in range(num_tasks)
            ]
            for level in range(self.num_levels)
        ]
        self.shared_gate_final = [
            nn.Dense(
                shared_gate_out, use_bias=False, kernel_init=torch_linear_init,
                name=f"shared_gate_final_{level}",
            )
            for level in range(self.num_levels)
        ]
        if len(self.tower_dnn_hidden_units) > 0:
            self.tower_dnn = [
                DNN(
                    inputs_dim=exp_dim, hidden_units=self.tower_dnn_hidden_units,
                    name=f"tower_dnn_{i}", **dnn_kw,
                )
                for i in range(num_tasks)
            ]
        self.tower_final = [
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

    def _cgc_net(self, inputs, level, training):
        num_tasks = len(self.task_types)
        specific_outs = []
        for i in range(num_tasks):
            for j in range(self.specific_expert_num):
                specific_outs.append(
                    self.specific_experts[level][i][j](inputs[i], training=training)
                )
        shared_outs = []
        for k in range(self.shared_expert_num):
            shared_outs.append(
                self.shared_experts[level][0][k](inputs[-1], training=training)
            )
        cgc_outs = []
        for i in range(num_tasks):
            cur = (
                specific_outs[
                    i * self.specific_expert_num : (i + 1) * self.specific_expert_num
                ]
                + shared_outs
            )
            cur = jnp.stack(cur, axis=1)  # [B, n, dim]
            if len(self.gate_dnn_hidden_units) > 0:
                g = self.specific_gate_dnn[level][i][0](inputs[i], training=training)
                g = self.specific_gate_final[level][i](g)
            else:
                g = self.specific_gate_final[level][i](inputs[i])
            gate = nn.softmax(g, axis=1)
            cgc_outs.append(jnp.einsum("bk,bkd->bd", gate, cur))
        cur = jnp.stack(specific_outs + shared_outs, axis=1)
        if len(self.gate_dnn_hidden_units) > 0:
            g = self.shared_gate_dnn[level](inputs[-1], training=training)
            g = self.shared_gate_final[level](g)
        else:
            g = self.shared_gate_final[level](inputs[-1])
        gate = nn.softmax(g, axis=1)
        cgc_outs.append(jnp.einsum("bk,bkd->bd", gate, cur))
        return cgc_outs

    def __call__(self, batch, training: bool = False):
        sparse_list, dense_list = self.embedding_dict.fast_inputs(
            batch, self.dnn_cols
        )
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        num_tasks = len(self.task_types)
        ple_inputs = [dnn_input] * (num_tasks + 1)
        ple_outputs = []
        for level in range(self.num_levels):
            ple_outputs = self._cgc_net(ple_inputs, level, training)
            ple_inputs = ple_outputs
        task_outs = []
        for i in range(num_tasks):
            h = ple_outputs[i]
            if len(self.tower_dnn_hidden_units) > 0:
                h = self.tower_dnn[i](h, training=training)
            logit = self.tower_final[i](h)
            task_outs.append(self.outs[i](logit))
        return {"pred": jnp.concatenate(task_outs, axis=-1)}


class PLE(BaseModel):
    def __init__(
        self, dnn_feature_columns, shared_expert_num=1, specific_expert_num=1,
        num_levels=2, expert_dnn_hidden_units=(256, 128),
        gate_dnn_hidden_units=(64,), tower_dnn_hidden_units=(64,),
        l2_reg_linear=0.00001, l2_reg_embedding=0.00001, l2_reg_dnn=0,
        init_std=0.0001, seed=1024, dnn_dropout=0, dnn_activation="relu",
        dnn_use_bn=False, task_types=("binary", "binary"),
        task_names=("ctr", "ctcvr"), device=None, gpus=None,
    ):
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=l2_reg_linear,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            device=device, gpus=gpus,
        )
        self.num_tasks = len(task_names)
        if self.num_tasks <= 1:
            raise ValueError("num_tasks must be greater than 1!")
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
        self.shared_expert_num = shared_expert_num
        self.specific_expert_num = specific_expert_num
        self.num_levels = num_levels
        self.task_names = tuple(task_names)
        self.task_types = tuple(task_types)
        self.expert_dnn_hidden_units = tuple(expert_dnn_hidden_units)
        self.gate_dnn_hidden_units = tuple(gate_dnn_hidden_units)
        self.tower_dnn_hidden_units = tuple(tower_dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        for pat in (
            ("specific_expert_", "/kernel"),
            ("shared_expert_", "/kernel"),
            ("specific_gate_", "/kernel"),
            ("shared_gate_", "/kernel"),
            ("gate_final",),
            ("tower_dnn_", "/kernel"),
            ("tower_final_",),
        ):
            self.add_regularization_weight(pat, l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return PLEModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            shared_expert_num=self.shared_expert_num,
            specific_expert_num=self.specific_expert_num,
            num_levels=self.num_levels,
            expert_dnn_hidden_units=self.expert_dnn_hidden_units,
            gate_dnn_hidden_units=self.gate_dnn_hidden_units,
            tower_dnn_hidden_units=self.tower_dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task_types=self.task_types,
        )
