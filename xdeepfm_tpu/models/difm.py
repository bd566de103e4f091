"""DIFM (reference: ``deepctr/models/difm.py:16-106``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import FM, InteractingLayer


class DIFMModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    sparse_feat_num: int
    att_head_num: int = 4
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
        self.fm = FM(name="fm")
        self.vector_wise_net = InteractingLayer(
            embedding_size=self.embedding_size,
            head_num=self.att_head_num,
            use_res=self.att_res,
            scaling=True,
            name="vector_wise_net",
        )
        self.bit_wise_net = DNN(
            inputs_dim=compute_input_dim(self.dnn_cols, include_dense=False),
            hidden_units=self.dnn_hidden_units,
            activation=self.dnn_activation,
            dropout_rate=self.dnn_dropout,
            use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            name="bit_wise_net",
        )
        self.transform_matrix_P_vec = nn.Dense(
            self.sparse_feat_num, use_bias=False, kernel_init=torch_linear_init,
            name="transform_matrix_P_vec",
        )
        self.transform_matrix_P_bit = nn.Dense(
            self.sparse_feat_num, use_bias=False, kernel_init=torch_linear_init,
            name="transform_matrix_P_bit",
        )
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        sparse_stack, _ = self.embedding_dict.stacked_inputs(batch, self.dnn_cols)
        if sparse_stack is None:
            raise ValueError("there are no sparse features")
        att_out = self.vector_wise_net(sparse_stack, training=training)
        att_out = att_out.reshape(att_out.shape[0], -1)
        m_vec = self.transform_matrix_P_vec(att_out)

        dnn_input = sparse_stack.reshape(sparse_stack.shape[0], -1)
        dnn_output = self.bit_wise_net(dnn_input, training=training)
        m_bit = self.transform_matrix_P_bit(dnn_output)

        m_x = m_vec + m_bit
        logit = self.linear_model(batch, sparse_feat_refine_weight=m_x)
        refined_fm_input = sparse_stack * m_x[:, :, None]
        logit = logit + self.fm(refined_fm_input)
        return {"pred": self.out(logit)}


class DIFM(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns, att_head_num=4,
        att_res=True, dnn_hidden_units=(256, 128), l2_reg_linear=0.00001,
        l2_reg_embedding=0.00001, l2_reg_dnn=0, init_std=0.0001, seed=1024,
        dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False, task="binary",
        device=None, gpus=None,
    ):
        if not len(dnn_hidden_units) > 0:
            raise ValueError("dnn_hidden_units is null!")
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.att_head_num = att_head_num
        self.att_res = att_res
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        self.add_regularization_weight(("vector_wise_net/",), l2=l2_reg_dnn)
        self.add_regularization_weight(("bit_wise_net/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("transform_matrix_P_vec/",), l2=l2_reg_dnn)
        self.add_regularization_weight(("transform_matrix_P_bit/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        from ..features import SparseFeat, VarLenSparseFeat

        sparse_feat_num = len(
            [
                f
                for f in self.dnn_feature_columns
                if isinstance(f, (SparseFeat, VarLenSparseFeat))
            ]
        )
        return DIFMModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            sparse_feat_num=sparse_feat_num,
            att_head_num=self.att_head_num,
            att_res=self.att_res,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
