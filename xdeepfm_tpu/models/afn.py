"""AFN (reference: ``deepctr/models/afn.py:17-74``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema
from ..nn.core import DNN, PredictionLayer, torch_bias_init, torch_linear_init
from ..nn.interaction import LogTransformLayer


class AFNModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    field_num: int
    ltl_hidden_size: int = 256
    afn_dnn_hidden_units: Tuple[int, ...] = (256, 128)
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
        self.ltl = LogTransformLayer(
            field_size=self.field_num,
            embedding_size=self.embedding_size,
            ltl_hidden_size=self.ltl_hidden_size,
            name="ltl",
        )
        self.afn_dnn = DNN(
            inputs_dim=self.embedding_size * self.ltl_hidden_size,
            hidden_units=self.afn_dnn_hidden_units,
            activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout,
            use_bn=True,
            init_std=self.init_std,
            name="afn_dnn",
        )
        # reference uses nn.Linear WITH bias here (afn.py:56)
        self.afn_dnn_linear = nn.Dense(
            1,
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(self.afn_dnn_hidden_units[-1]),
            name="afn_dnn_linear",
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, _ = self.embedding_dict.stacked_inputs(batch, self.dnn_cols)
        logit = self.linear_model(batch)
        if sparse_stack is None:
            raise ValueError(
                "Sparse embeddings not provided. AFN only accepts sparse "
                "embeddings as input."
            )
        ltl_result = self.ltl(sparse_stack, training=training)
        afn_logit = self.afn_dnn(ltl_result, training=training)
        logit = logit + self.afn_dnn_linear(afn_logit)
        return {"pred": self.out(logit)}


class AFN(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns, ltl_hidden_size=256,
        afn_dnn_hidden_units=(256, 128), l2_reg_linear=0.00001,
        l2_reg_embedding=0.00001, l2_reg_dnn=0, init_std=0.0001, seed=1024,
        dnn_dropout=0, dnn_activation="relu", task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.ltl_hidden_size = ltl_hidden_size
        self.afn_dnn_hidden_units = tuple(afn_dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self._finalize()

    def _build_module(self):
        from ..features import split_columns

        sp, _, vl = split_columns(self.dnn_feature_columns)
        return AFNModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            field_num=len(sp) + len(vl),
            ltl_hidden_size=self.ltl_hidden_size,
            afn_dnn_hidden_units=self.afn_dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            init_std=self.init_std,
            task=self.task,
        )
