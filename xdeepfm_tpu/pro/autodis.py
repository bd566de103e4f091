"""AutoDis — learned soft discretization of dense features
(reference: ``deepctr/xdeepfm_pro/autodis.py``).

TPU redesign: the reference loops per-feature through tiny ``nn.Sequential``
projectors (``autodis.py:99-121``).  Here all features run **batched** through
stacked parameters — one einsum per stage — so the whole AutoDis encode is a
handful of MXU ops regardless of feature count.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.core import torch_bias_init, torch_linear_init


def _stacked_linear_init(n):
    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, n)
        return jnp.stack([torch_linear_init(k, shape[1:], dtype) for k in keys])

    return init


def _stacked_bias_init(n, fan_in):
    base = torch_bias_init(fan_in)

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, n)
        return jnp.stack([base(k, shape[1:], dtype) for k in keys])

    return init


class AutoDisLayer(nn.Module):
    """Per-dense-feature: MLP(1->buckets->buckets, LeakyReLU 0.2) ->
    softmax(scores / learned temperature) -> weighted sum of meta-embeddings
    (reference ``autodis.py:20-127``).

    Input: dense values [B, F]; output: ([B, F*E], [B, F, E]).
    """

    num_features: int
    num_buckets: int = 16
    embedding_dim: int = 8
    temperature: float = 1.0
    keep_raw: bool = True

    @nn.compact
    def __call__(self, dense_values):
        F_, K, E = self.num_features, self.num_buckets, self.embedding_dim
        B = dense_values.shape[0]
        if F_ == 0:
            return jnp.zeros((B, 0)), jnp.zeros((B, 0, E))
        meta = self.param(
            "meta_embeddings",
            lambda key, shape: jax.random.normal(key, shape) * 0.01,
            (F_, K, E),
        )
        w1 = self.param("proj_w1", _stacked_linear_init(F_), (F_, 1, K))
        b1 = self.param("proj_b1", _stacked_bias_init(F_, 1), (F_, K))
        w2 = self.param("proj_w2", _stacked_linear_init(F_), (F_, K, K))
        b2 = self.param("proj_b2", _stacked_bias_init(F_, K), (F_, K))
        temps = self.param(
            "feature_temperatures",
            nn.initializers.constant(self.temperature),
            (F_,),
        )
        # batched per-feature projector: [B, F] -> [B, F, K]
        h = dense_values[:, :, None] * w1[None, :, 0, :] + b1[None]
        h = nn.leaky_relu(h, negative_slope=0.2)
        scores = jnp.einsum("bfk,fkj->bfj", h, w2) + b2[None]
        weights = nn.softmax(scores / temps[None, :, None], axis=-1)
        emb = jnp.einsum("bfk,fke->bfe", weights, meta)  # [B, F, E]
        return emb.reshape(B, -1), emb

    def bucket_indices(self, dense_values, variables):
        """Dominant bucket per feature (reference ``autodis.py:129-149``)."""
        p = variables["params"]
        h = dense_values[:, :, None] * p["proj_w1"][None, :, 0, :] + p["proj_b1"][None]
        h = nn.leaky_relu(h, negative_slope=0.2)
        scores = jnp.einsum("bfk,fkj->bfj", h, p["proj_w2"]) + p["proj_b2"][None]
        return jnp.argmax(scores, axis=-1)


class DenseFeatureEncoder(nn.Module):
    """AutoDis or passthrough (reference ``autodis.py:152-238``)."""

    num_features: int
    embedding_dim: int = 8
    use_autodis: bool = True
    num_buckets: int = 16
    temperature: float = 1.0

    def setup(self):
        if self.use_autodis and self.num_features > 0:
            self.autodis = AutoDisLayer(
                num_features=self.num_features,
                num_buckets=self.num_buckets,
                embedding_dim=self.embedding_dim,
                temperature=self.temperature,
                name="autodis",
            )

    def __call__(self, dense_values) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = dense_values.shape[0]
        if self.num_features == 0:
            z = jnp.zeros((B, 0))
            return z, jnp.zeros((B, 0, self.embedding_dim)), z
        if self.use_autodis:
            flat, emb = self.autodis(dense_values)
            return flat, emb, dense_values
        return dense_values, dense_values[:, :, None], dense_values

    def get_output_dim(self) -> int:
        if self.use_autodis:
            return self.num_features * self.embedding_dim
        return self.num_features
