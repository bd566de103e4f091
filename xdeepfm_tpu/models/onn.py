"""ONN / NFFM (reference: ``deepctr/models/onn.py:37-158``).

The reference creates O(F^2) pairs of per-pair embedding tables (``Interac``,
``onn.py:14-34``) looked up one pair at a time.  TPU-native layout: ALL pair
tables (both sides) stack into one [sum_vocab, E] matrix, so the whole
second-order lookup is TWO gathers (first-side rows, second-side rows) and an
elementwise product.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..basemodel import BaseModel
from ..embeddings import EmbeddingCollection, LinearModel
from ..features import DenseFeat, FeatureSchema, SparseFeat
from ..nn.core import DNN, PredictionLayer, torch_linear_init


class ONNModule(nn.Module):
    linear_cols: tuple
    dnn_cols: tuple
    schema: FeatureSchema
    embedding_size: int
    dnn_hidden_units: Tuple[int, ...] = (128, 128)
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
        sp = [f for f in self.dnn_cols if isinstance(f, SparseFeat)]
        self._sp = tuple(sp)
        pairs = []
        for i in range(len(sp) - 1):
            for j in range(i + 1, len(sp)):
                pairs.append((i, j))
        self._pairs = tuple(pairs)
        # stacked first-side and second-side tables
        first_offsets, second_offsets = [], []
        off1 = off2 = 0
        for i, j in pairs:
            first_offsets.append(off1)
            off1 += sp[i].vocabulary_size
            second_offsets.append(off2)
            off2 += sp[j].vocabulary_size
        self._first_offsets = np.array(first_offsets, dtype=np.int32)
        self._second_offsets = np.array(second_offsets, dtype=np.int32)
        E = self.embedding_size
        # reference inits only emb1 with normal(init_std) and leaves emb2 at
        # torch default N(0,1) — an apparent oversight; we init both with
        # normal(init_std) (onn.py:21-22).
        self.second_order_emb1 = self.param(
            "second_order_emb1",
            nn.initializers.normal(stddev=self.init_std),
            (off1, E),
        )
        self.second_order_emb2 = self.param(
            "second_order_emb2",
            nn.initializers.normal(stddev=self.init_std),
            (off2, E),
        )
        dense_dim = sum(
            f.dimension for f in self.dnn_cols if isinstance(f, DenseFeat)
        )
        n_pairs = len(pairs)
        self.dnn = DNN(
            inputs_dim=n_pairs * E + dense_dim,
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
        self.out = PredictionLayer(task=self.task, name="out")

    def __call__(self, batch, training: bool = False):
        linear_logit = self.linear_model(batch)
        sp = self._sp
        cols_first = np.array(
            [self.schema.sparse_index(sp[i].name) for i, _ in self._pairs]
        )
        cols_second = np.array(
            [self.schema.sparse_index(sp[j].name) for _, j in self._pairs]
        )
        ids1 = batch["sparse"][:, cols_first] + self._first_offsets[None, :]
        ids2 = batch["sparse"][:, cols_second] + self._second_offsets[None, :]
        emb1 = jnp.take(self.second_order_emb1, ids1, axis=0)  # [B, P, E]
        emb2 = jnp.take(self.second_order_emb2, ids2, axis=0)
        second_order = (emb1 * emb2).reshape(emb1.shape[0], -1)
        parts = [second_order]
        de = [f for f in self.dnn_cols if isinstance(f, DenseFeat)]
        if de:
            parts.append(
                jnp.concatenate(
                    [
                        batch["dense"][:, slice(*self.schema.dense_slice(f.name))]
                        for f in de
                    ],
                    axis=-1,
                )
            )
        dnn_out = self.dnn(jnp.concatenate(parts, axis=-1), training=training)
        dnn_logit = self.dnn_linear(dnn_out)
        final_logit = (
            dnn_logit + linear_logit if len(self.dnn_cols) > 0 else linear_logit
        )
        return {"pred": self.out(final_logit)}


class ONN(BaseModel):
    def __init__(
        self, linear_feature_columns, dnn_feature_columns,
        dnn_hidden_units=(128, 128), l2_reg_embedding=1e-5, l2_reg_linear=1e-5,
        l2_reg_dnn=0, dnn_dropout=0, init_std=0.0001, seed=1024,
        dnn_use_bn=False, dnn_activation="relu", task="binary", device=None,
        gpus=None,
    ):
        super().__init__(
            linear_feature_columns, dnn_feature_columns,
            l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
            init_std=init_std, seed=seed, task=task, device=device, gpus=gpus,
        )
        self.dnn_hidden_units = tuple(dnn_hidden_units)
        self.dnn_dropout = dnn_dropout
        self.dnn_activation = dnn_activation
        self.dnn_use_bn = dnn_use_bn
        # second-order embedding reg (onn.py:73)
        self.add_regularization_weight(("second_order_emb",), l2=l2_reg_embedding)
        self.add_regularization_weight(("dnn/", "/kernel"), l2=l2_reg_dnn)
        self.add_regularization_weight(("dnn_linear/",), l2=l2_reg_dnn)
        self._finalize()

    def _build_module(self):
        return ONNModule(
            linear_cols=self.linear_feature_columns,
            dnn_cols=self.dnn_feature_columns,
            schema=self.schema,
            embedding_size=self.embedding_size,
            dnn_hidden_units=self.dnn_hidden_units,
            dnn_dropout=self.dnn_dropout,
            dnn_activation=self.dnn_activation,
            dnn_use_bn=self.dnn_use_bn,
            init_std=self.init_std,
            task=self.task,
        )
