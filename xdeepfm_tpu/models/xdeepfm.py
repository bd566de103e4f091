"""xDeepFM (reference: ``deepctr/models/xdeepfm.py``).

linear + CIN + DNN towers, 4-way logit combination (``xdeepfm.py:94-103``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel, combined_dnn_input
from ..features import FeatureSchema, split_columns
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import CIN


class XDeepFMModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    dnn_hidden_units: Tuple[int, ...] = (256, 256)
    cin_layer_size: Tuple[int, ...] = (256, 128)
    cin_split_half: bool = True
    cin_activation: str = "relu"
    l2_reg_dnn: float = 0.0
    l2_reg_cin: float = 0.0
    init_std: float = 1e-4
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
    task: str = "binary"

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols,
            schema=self.schema,
            init_std=self.init_std,
            name="embedding_dict",
        )
        self.linear_model = LinearModel(
            feature_columns=self.linear_cols,
            schema=self.schema,
            init_std=self.init_std,
            name="linear_model",
        )
        sp, de, vl = split_columns(self.dnn_cols)
        self.use_dnn = len(self.dnn_cols) > 0 and len(self.dnn_hidden_units) > 0
        self.use_cin = len(self.cin_layer_size) > 0 and len(self.dnn_cols) > 0
        if self.use_dnn:
            from ..features import compute_input_dim

            self.dnn = DNN(
                inputs_dim=compute_input_dim(self.dnn_cols),
                hidden_units=self.dnn_hidden_units,
                activation=self.dnn_activation,
                l2_reg=self.l2_reg_dnn,
                dropout_rate=self.dnn_dropout,
                use_bn=self.dnn_use_bn,
                init_std=self.init_std,
                name="dnn",
            )
            self.dnn_linear = nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
            )
        if self.use_cin:
            # field_num: number of field-embedding vectors feeding the CIN
            # (sparse + pooled varlen; the reference uses len(embedding_dict)
            # at xdeepfm.py:65, identical whenever embedding_names are unique —
            # and a shape mismatch crash otherwise, so this is the working case).
            field_num = len(sp) + len(vl)
            self.cin = CIN(
                field_size=field_num,
                layer_size=self.cin_layer_size,
                activation=self.cin_activation,
                split_half=self.cin_split_half,
                l2_reg=self.l2_reg_cin,
                seed=self.seed,
                name="cin",
            )
            self.cin_linear = nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init, name="cin_linear"
            )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, dense_vals = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols
        )
        final_logit = self.linear_model(batch)
        if self.use_cin:
            cin_output = self.cin(sparse_stack, training=training)
            final_logit = final_logit + self.cin_linear(cin_output)
        if self.use_dnn:
            parts = []
            if sparse_stack is not None:
                parts.append(sparse_stack.reshape(sparse_stack.shape[0], -1))
            if dense_vals is not None:
                parts.append(dense_vals)
            dnn_input = jnp.concatenate(parts, axis=-1)
            dnn_output = self.dnn(dnn_input, training=training)
            final_logit = final_logit + self.dnn_linear(dnn_output)
        return {"pred": self.out(final_logit)}


class xDeepFM(BaseModel):
    """Drop-in equivalent of the reference xDeepFM class
    (``deepctr/models/xdeepfm.py:17-107``)."""

    def __init__(
        self,
        linear_feature_columns,
        dnn_feature_columns,
        dnn_hidden_units=(256, 256),
        cin_layer_size=(256, 128),
        cin_split_half=True,
        cin_activation="relu",
        l2_reg_linear=0.00001,
        l2_reg_embedding=0.00001,
        l2_reg_dnn=0,
        l2_reg_cin=0,
        init_std=0.0001,
        seed=1024,
        dnn_dropout=0,
        dnn_activation="relu",
        dnn_use_bn=False,
        task="binary",
        device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns,
            dnn_feature_columns,
            l2_reg_linear=l2_reg_linear,
            l2_reg_embedding=l2_reg_embedding,
            init_std=init_std,
            seed=seed,
            task=task,
            device=device,
            gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.cin_layer_size = tuple(cin_layer_size)
        self.cin_split_half = cin_split_half
        self.cin_activation = cin_activation
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        # reg registrations mirror xdeepfm.py:57-60,74-75
        if len(dnn_feature_columns) > 0 and len(self.dnn_hidden_units) > 0:
            self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
            self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        if len(self.cin_layer_size) > 0 and len(dnn_feature_columns) > 0:
            self.add_regularization_weight(("cin/", "conv_w"), l2=l2_reg_cin)
        self._l2_reg_dnn = l2_reg_dnn
        self._l2_reg_cin = l2_reg_cin
        self._finalize()

    def _build_module(self):
        return XDeepFMModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            dnn_hidden_units=self.dnn_hidden_units,
            cin_layer_size=self.cin_layer_size,
            cin_split_half=self.cin_split_half,
            cin_activation=self.cin_activation,
            l2_reg_dnn=self._l2_reg_dnn,
            l2_reg_cin=self._l2_reg_cin,
            init_std=self.init_std,
            seed=self.seed,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            task=self.task,
        )
