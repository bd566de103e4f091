"""xDeepFM with attention-pooled CIN (reference: ``deepctr/models/xdeepfm_attn.py``).

Same skeleton as xDeepFM; CIN -> CINAttention (v1, projects back to
featuremap_num) or CINAttentionV2 (returns [B, E], ``xdeepfm_attn.py:176-301``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import FeatureSchema, compute_input_dim, split_columns
from ..nn.cin_attention import CINAttention, CINAttentionV2
from ..nn.core import DNN, PredictionLayer, torch_linear_init


class XDeepFMAttnModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    version: int = 1  # 1 or 2
    dnn_hidden_units: Tuple[int, ...] = (256, 256)
    cin_layer_size: Tuple[int, ...] = (256, 128)
    cin_split_half: bool = True
    cin_activation: str = "relu"
    cin_num_heads: int = 4
    cin_attn_dropout: float = 0.0
    cin_use_layer_norm: bool = True
    cin_use_residual: bool = True
    cin_num_attn_layers: int = 1
    init_std: float = 1e-4
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: str = "relu"
    dnn_use_bn: bool = False
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
        sp, _, vl = split_columns(self.dnn_cols)
        self.use_dnn = len(self.dnn_cols) > 0 and len(self.dnn_hidden_units) > 0
        self.use_cin = len(self.cin_layer_size) > 0 and len(self.dnn_cols) > 0
        if self.use_dnn:
            self.dnn = DNN(
                inputs_dim=compute_input_dim(self.dnn_cols),
                hidden_units=self.dnn_hidden_units,
                activation=self.dnn_activation,
                dropout_rate=self.dnn_dropout,
                use_bn=self.dnn_use_bn,
                init_std=self.init_std,
                name="dnn",
            )
            self.dnn_linear = nn.Dense(
                1, use_bias=False, kernel_init=torch_linear_init, name="dnn_linear"
            )
        if self.use_cin:
            field_num = len(sp) + len(vl)
            common = dict(
                field_size=field_num,
                embedding_size=self.embedding_size,
                layer_size=self.cin_layer_size,
                activation=self.cin_activation,
                split_half=self.cin_split_half,
                num_heads=self.cin_num_heads,
                attn_dropout=self.cin_attn_dropout,
                use_layer_norm=self.cin_use_layer_norm,
                use_residual=self.cin_use_residual,
                seed=self.seed,
                name="cin",
            )
            if self.version == 1:
                self.cin = CINAttention(**common)
            else:
                self.cin = CINAttentionV2(
                    num_attn_layers=self.cin_num_attn_layers, **common
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
            parts = [sparse_stack.reshape(sparse_stack.shape[0], -1)]
            if dense_vals is not None:
                parts.append(dense_vals)
            dnn_out = self.dnn(jnp.concatenate(parts, axis=-1), training=training)
            final_logit = final_logit + self.dnn_linear(dnn_out)
        return {"pred": self.out(final_logit)}


class _XDeepFMAttnBase(BaseModel):
    _version = 1

    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(256, 256), cin_layer_size=(256, 128),
        cin_split_half=True, cin_activation="relu", cin_num_heads=4,
        cin_attn_dropout=0.0, cin_use_layer_norm=True, cin_use_residual=True,
        cin_num_attn_layers=1, l2_reg_linear=0.00001, l2_reg_embedding=0.00001,
        l2_reg_dnn=0, l2_reg_cin=0, init_std=0.0001, seed=1024, dnn_dropout=0,
        dnn_activation="relu", dnn_use_bn=False, task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.cin_layer_size = tuple(cin_layer_size)
        self.cin_split_half = cin_split_half
        self.cin_activation = cin_activation
        self.cin_num_heads = cin_num_heads
        self.cin_attn_dropout = cin_attn_dropout
        self.cin_use_layer_norm = cin_use_layer_norm
        self.cin_use_residual = cin_use_residual
        self.cin_num_attn_layers = cin_num_attn_layers
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        if len(dnn_feature_columns) > 0 and len(self.dnn_hidden_units) > 0:
            self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
            self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        if len(self.cin_layer_size) > 0 and len(dnn_feature_columns) > 0:
            # reference registers every 'weight' in cin.named_parameters()
            # (xdeepfm_attn.py:126-129): conv kernels + attention projections.
            self.add_regularization_weight(("cin/", "conv_w"), l2=l2_reg_cin)
            self.add_regularization_weight(("cin/", "/kernel"), l2=l2_reg_cin)
        self._finalize()

    def _get_embedding_size(self, feature_columns):
        """First sparse feat's dim, default 4 (``xdeepfm_attn.py:130-141``)."""
        from ..features import SparseFeat, VarLenSparseFeat

        for feat in feature_columns:
            if isinstance(feat, (SparseFeat, VarLenSparseFeat)):
                return feat.embedding_dim
        return 4

    def _build_module(self):
        return XDeepFMAttnModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self._get_embedding_size(self.dnn_feature_columns),
            version=self._version,
            dnn_hidden_units=self.dnn_hidden_units,
            cin_layer_size=self.cin_layer_size,
            cin_split_half=self.cin_split_half,
            cin_activation=self.cin_activation,
            cin_num_heads=self.cin_num_heads,
            cin_attn_dropout=self.cin_attn_dropout,
            cin_use_layer_norm=self.cin_use_layer_norm,
            cin_use_residual=self.cin_use_residual,
            cin_num_attn_layers=self.cin_num_attn_layers,
            init_std=self.init_std,
            seed=self.seed,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            task=self.task,
        )


class xDeepFMAttention(_XDeepFMAttnBase):
    """v1: attention-pooled CIN projected back to featuremap_num
    (``xdeepfm_attn.py:25-173``)."""

    _version = 1


class xDeepFMAttentionV2(_XDeepFMAttnBase):
    """v2: stacked MHSA blocks, CIN output dim = embedding_size
    (``xdeepfm_attn.py:176-301``)."""

    _version = 2
