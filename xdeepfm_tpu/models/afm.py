"""AFM (reference: ``deepctr/models/afm.py:15-66``)."""

from __future__ import annotations

import flax.linen as nn

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema
from ..nn.core import PredictionLayer
from ..nn.interaction import AFMLayer, FM


class AFMModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    use_attention: bool = True
    attention_factor: int = 8
    l2_reg_att: float = 1e-5
    afm_dropout: float = 0.0
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
        if self.use_attention:
            self.fm = AFMLayer(
                in_features=self.embedding_size,
                attention_factor=self.attention_factor,
                l2_reg_w=self.l2_reg_att,
                dropout_rate=self.afm_dropout,
                name="fm",
            )
        else:
            self.fm = FM(name="fm")
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, _ = self.embedding_dict.stacked_inputs(
            batch, self.dnn_cols, support_dense=False
        )
        logit = self.linear_model(batch)
        if sparse_stack is not None:
            if self.use_attention:
                logit = logit + self.fm(sparse_stack, training=training)
            else:
                logit = logit + self.fm(sparse_stack)
        return {"pred": self.out(logit)}


class AFM(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns, use_attention=True,
        attention_factor=8, l2_reg_linear=1e-5, l2_reg_embedding=1e-5,
        l2_reg_att=1e-5, afm_dropout=0, init_std=0.0001, seed=1024,
        task="binary", device=None, gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.use_attention = use_attention
        self.attention_factor = attention_factor
        self.l2_reg_att = l2_reg_att
        self.afm_dropout = afm_dropout
        if use_attention:
            # reference registers only attention_W (afm.py:46)
            self.add_regularization_weight(("fm/attention_W",), l2=l2_reg_att)
        self._finalize()

    def _build_module(self):
        return AFMModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            use_attention=self.use_attention,
            attention_factor=self.attention_factor,
            l2_reg_att=self.l2_reg_att,
            afm_dropout=self.afm_dropout,
            init_std=self.init_std,
            task=self.task,
        )
