"""PNN (reference: ``deepctr/models/pnn.py:17-109``).  No linear term."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection
from ..features import FeatureSchema, compute_input_dim
from ..nn.core import DNN, PredictionLayer, torch_linear_init
from ..nn.interaction import InnerProductLayer, OutterProductLayer


class PNNModule(nn.Module):
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    num_inputs: int
    dnn_hidden_units: Tuple[int, ...] = (128, 128)
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    use_inner: bool = True
    use_outter: bool = False
    kernel_type: str = "mat"
    init_std: float = 1e-4
    task: str = "binary"

    def setup(self):
        self.embedding_dict = EmbeddingCollection(
            feature_columns=self.dnn_cols, schema=self.schema,
            init_std=self.init_std, name="embedding_dict",
        )
        num_pairs = self.num_inputs * (self.num_inputs - 1) // 2
        product_out_dim = 0
        if self.use_inner:
            product_out_dim += num_pairs
            self.innerproduct = InnerProductLayer(name="innerproduct")
        if self.use_outter:
            product_out_dim += num_pairs
            self.outterproduct = OutterProductLayer(
                field_size=self.num_inputs,
                embedding_size=self.embedding_size,
                kernel_type=self.kernel_type,
                name="outterproduct",
            )
        self.dnn = DNN(
            inputs_dim=product_out_dim + compute_input_dim(self.dnn_cols),
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
        linear_signal = sparse_stack.reshape(sparse_stack.shape[0], -1)
        parts = [linear_signal]
        if self.use_inner:
            inner = self.innerproduct(sparse_stack)
            parts.append(inner.reshape(inner.shape[0], -1))
        if self.use_outter:
            parts.append(self.outterproduct(sparse_stack))
        product_layer = jnp.concatenate(parts, axis=1)
        dnn_parts = [product_layer]
        if dense_vals is not None:
            dnn_parts.append(dense_vals)
        dnn_input = jnp.concatenate(dnn_parts, axis=-1)
        dnn_out = self.dnn(dnn_input, training=training)
        logit = self.dnn_linear(dnn_out)
        return {"pred": self.out(logit)}


class PNN(BaseModel):
    def __init__(
        self, dnn_feature_columns, dnn_hidden_units=(128, 128),
        l2_reg_embedding=1e-5, l2_reg_dnn=0, init_std=0.0001, seed=1024,
        dnn_dropout=0, dnn_activation="relu", use_inner=True, use_outter=False,
        kernel_type="mat", task="binary", device=None, gpus=None,
    ):
        if kernel_type not in ["mat", "vec", "num"]:
            raise ValueError("kernel_type must be mat,vec or num")
        super().__init__(
            [], dnn_feature_columns, l2_reg_linear=0,
            l2_reg_embedding=l2_reg_embedding, init_std=init_std, seed=seed,
            task=task, device=device, gpus=gpus,
        )
        self.use_inner = use_inner
        self.use_outter = use_outter
        self.kernel_type = kernel_type
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        num_inputs = self.compute_input_dim(
            self.dnn_feature_columns, include_dense=False, feature_group=True
        )
        return PNNModule(
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            num_inputs=num_inputs,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            use_inner=self.use_inner,
            use_outter=self.use_outter,
            kernel_type=self.kernel_type,
            init_std=self.init_std,
            task=self.task,
        )
