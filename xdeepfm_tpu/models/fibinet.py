"""FiBiNET (reference: ``deepctr/models/fibinet.py:17-102``).

Note the reference shares ONE BilinearInteraction between the SENET branch and
the raw-embedding branch (``fibinet.py:50,84-85``) — same here.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import (
    DenseFeat,
    FeatureSchema,
    SparseFeat,
    VarLenSparseFeat,
)
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import BilinearInteraction, SENETLayer


class FiBiNETModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    field_size: int
    embedding_size: int
    bilinear_type: str = "interaction"
    reduction_ratio: int = 3
    dnn_hidden_units: Tuple[int, ...] = (128, 128)
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
        self.SE = SENETLayer(
            filed_size=self.field_size,
            reduction_ratio=self.reduction_ratio,
            name="SE",
        )
        self.Bilinear = BilinearInteraction(
            filed_size=self.field_size,
            embedding_size=self.embedding_size,
            bilinear_type=self.bilinear_type,
            flatten_output=True,
            name="Bilinear",
        )
        F_ = self.field_size
        dense_dim = sum(
            f.dimension for f in self.dnn_cols if isinstance(f, DenseFeat)
        )
        self.dnn = DNN(
            inputs_dim=F_ * (F_ - 1) * self.embedding_size + dense_dim,
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
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, dense_vals = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols
        )
        senet_output = self.SE(sparse_stack, training=training)
        # flat [B, P*E] outputs: the concat+flatten below stays in the
        # compact layout (concat of padded [B, P, E] blocks re-materializes
        # ~13x the logical bytes)
        senet_bilinear_out = self.Bilinear(senet_output, training=training)
        bilinear_out = self.Bilinear(sparse_stack, training=training)
        linear_logit = self.linear_model(batch)
        parts = [jnp.concatenate([senet_bilinear_out, bilinear_out], axis=1)]
        if dense_vals is not None:
            parts.append(dense_vals)
        dnn_out = self.dnn(jnp.concatenate(parts, axis=-1), training=training)
        dnn_logit = self.dnn_linear(dnn_out)
        if len(self.linear_cols) > 0 and len(self.dnn_cols) > 0:
            final_logit = linear_logit + dnn_logit
        elif len(self.linear_cols) == 0:
            final_logit = dnn_logit
        else:
            final_logit = linear_logit
        return {"pred": self.out(final_logit)}


class FiBiNET(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        bilinear_type="interaction", reduction_ratio=3,
        dnn_hidden_units=(128, 128), l2_reg_linear=1e-5, l2_reg_embedding=1e-5,
        l2_reg_dnn=0, init_std=0.0001, seed=1024, dnn_dropout=0,
        dnn_activation="relu", task="binary", device=None, gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.bilinear_type = bilinear_type
        self.reduction_ratio = reduction_ratio
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self._finalize()

    def _build_module(self):
        field_size = len(
            [
                f
                for f in self.dnn_feature_columns
                if isinstance(f, (SparseFeat, VarLenSparseFeat))
            ]
        )
        return FiBiNETModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            field_size=field_size,
            embedding_size=self.embedding_size,
            bilinear_type=self.bilinear_type,
            reduction_ratio=self.reduction_ratio,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            init_std=self.init_std,
            task=self.task,
        )
