"""ONN / NFFM (reference: ``deepctr/models/onn.py:37-158``).

The reference creates O(F^2) pairs of per-pair embedding tables (``Interac``,
``onn.py:14-34``) looked up one pair at a time.  TPU-native layout: all pair
tables sharing an INPUT feature are stacked **column-wise** — feature ``i``'s
first-side table is ``[vocab_i, npairs_i * E]`` — so one id gathers the rows
for every pair that feature participates in.  The second-order lookup is then
2F wide-row gathers (~B*F row touches) instead of 2*B*P narrow ones; on TPU
the row-latency-bound gather/scatter cost drops by ~P/F (e.g. 12.5x for 26
fields), measured 175.9 -> 2.94 ms/step (60x) at Criteo shapes (v5e-1).
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
        F = len(sp)
        pairs = []
        for i in range(F - 1):
            for j in range(i + 1, F):
                pairs.append((i, j))
        self._pairs = tuple(pairs)
        E = self.embedding_size
        # Feature-grouped pair tables: first side holds, per feature i, the
        # (i, j>i) pair embeddings side by side; second side per feature j the
        # (i<j, j) ones.  Row counts/content match the reference's per-pair
        # nn.Embedding pairs (onn.py:14-34) exactly — only the stacking axis
        # differs.  The reference inits only emb1 with normal(init_std) and
        # leaves emb2 at torch default N(0,1) — an apparent oversight; we init
        # both with normal(init_std) (onn.py:21-22).
        init = nn.initializers.normal(stddev=self.init_std)
        emb1, emb2 = [], []
        for k, f in enumerate(sp):
            n1, n2 = F - 1 - k, k
            emb1.append(
                self.param(f"second_order_emb1_f{k}", init,
                           (f.vocabulary_size, n1 * E)) if n1 else None
            )
            emb2.append(
                self.param(f"second_order_emb2_f{k}", init,
                           (f.vocabulary_size, n2 * E)) if n2 else None
            )
        self.second_order_emb1 = emb1
        self.second_order_emb2 = emb2
        # static permutation aligning the second-major concat order of the
        # second-side gathers, sorted by (j, i), with first-major pair order.
        # Applied as a COLUMN gather on the compact [B, P*E] 2-D tensor: the
        # previous [B, P, E] permute-then-multiply materialized three
        # E=10-minor tensors whose 128-lane padding cost 12.8x HBM bytes
        # (~0.7 GB/pass at bench shapes; CLAUDE.md layout playbook).
        second_major = sorted(range(len(pairs)),
                              key=lambda p: (pairs[p][1], pairs[p][0]))
        perm = np.empty(len(pairs), dtype=np.int32)
        perm[np.array(second_major, dtype=np.int32)] = np.arange(
            len(pairs), dtype=np.int32
        )
        self._second_cols = jnp.asarray(
            (perm[:, None] * E + np.arange(E)[None, :]).reshape(-1)
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
        B = batch["sparse"].shape[0]
        E = self.embedding_size
        # one wide-row gather per feature per side (see module docstring)
        parts1, parts2 = [], []
        for k, f in enumerate(sp):
            ids = batch["sparse"][:, self.schema.sparse_index(f.name)]
            if self.second_order_emb1[k] is not None:
                parts1.append(jnp.take(self.second_order_emb1[k], ids, axis=0))
            if self.second_order_emb2[k] is not None:
                parts2.append(jnp.take(self.second_order_emb2[k], ids, axis=0))
        P = len(self._pairs)
        if P:
            emb1 = jnp.concatenate(parts1, axis=1)          # [B, P*E]
            emb2 = jnp.concatenate(parts2, axis=1)          # second-major
            # second-major -> pair order, lane-compact 2-D column gather
            emb2 = jnp.take(emb2, self._second_cols, axis=1)
            second_order = emb1 * emb2
        else:
            second_order = jnp.zeros((B, 0), dtype=jnp.float32)
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
