"""Attention-pooled CIN (reference: ``deepctr/layers/cin_attention.py``).

Replaces CIN's sum-pool over the embedding axis with MHSA over the feature-map
axis + attention pooling.  Feature-map counts are <= a few hundred, so this is a
small-sequence attention — plain XLA matmuls, no sequence sharding needed
(SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .activations import make_activation
from .interaction import (
    cin_feature_maps,
    cin_feature_maps_t,
    cin_featuremap_num,
    make_cin_params,
)


class DenseT(nn.Module):
    """``nn.Dense`` over the CHANNEL axis of a transposed [B, E, S] tensor
    (param tree identical to ``nn.Dense``: kernel [in, out] + optional bias),
    so linear layers consume lane-compact transposed activations directly."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.glorot_uniform()

    @nn.compact
    def __call__(self, x_t):
        kernel = self.param(
            "kernel", self.kernel_init, (x_t.shape[1], self.features)
        )
        y = jnp.einsum("bes,ef->bfs", x_t, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias[None, :, None]
        return y


def get_valid_num_heads(embed_dim: int, num_heads: int) -> int:
    """Shrink head count until it divides embed_dim
    (reference: ``cin_attention.py:15-23``)."""
    if embed_dim % num_heads == 0:
        return num_heads
    for h in range(num_heads, 0, -1):
        if embed_dim % h == 0:
            return h
    return 1


class MultiHeadSelfAttention(nn.Module):
    """Standard MHSA over the feature-map axis
    (reference: ``cin_attention.py:26-97``). [B, S, E] -> [B, S, E]."""

    embed_dim: int
    num_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False, transposed: bool = False):
        """x: [B, S, E] batch-major, or [B, E, S] when ``transposed`` (S on
        the lane axis — the layout the CIN-attention glue runs in)."""
        num_heads = get_valid_num_heads(self.embed_dim, self.num_heads)
        head_dim = self.embed_dim // num_heads
        scale = math.sqrt(head_dim)
        glorot = nn.initializers.glorot_uniform()
        if transposed:
            B, E, S = x.shape
            dense = lambda name: DenseT(
                E, use_bias=False, kernel_init=glorot, name=name
            )
        else:
            B, S, E = x.shape
            dense = lambda name: nn.Dense(
                E, use_bias=False, kernel_init=glorot, name=name
            )
        # q/k/v stay in the projections' packed-head layout end to end (head
        # transposes materialized ~11 ms/step of relayout copies at B=4096 on
        # v5e, whichever side performed them); in transposed form the
        # [B, E, S] -> [B*heads, dh, S] head split is a free reshape
        Q = dense("W_q")(x)
        K = dense("W_k")(x)
        V = dense("W_v")(x)
        if self.dropout == 0.0 or not training:
            # fused VMEM-resident attention by default on single-chip TPU
            # (ops/attention_pallas.py), XLA einsums elsewhere
            from ..ops.attention_pallas import (
                mhsa_attention_packed,
                mhsa_attention_packed_t,
            )

            fn = mhsa_attention_packed_t if transposed else mhsa_attention_packed
            out = fn(Q, K, V, 1.0 / scale, num_heads)
        elif transposed:
            Qr = Q.reshape(B, num_heads, head_dim, S)
            Kr = K.reshape(B, num_heads, head_dim, S)
            Vr = V.reshape(B, num_heads, head_dim, S)
            scores = jnp.einsum("bhds,bhdt->bhst", Qr, Kr) / scale
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(rate=self.dropout)(
                probs, deterministic=not training
            )
            out = jnp.einsum("bhst,bhdt->bhds", probs, Vr).reshape(B, E, S)
        else:
            Qr = Q.reshape(B, S, num_heads, head_dim)
            Kr = K.reshape(B, S, num_heads, head_dim)
            Vr = V.reshape(B, S, num_heads, head_dim)
            scores = jnp.einsum("bshd,bthd->bhst", Qr, Kr) / scale
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(rate=self.dropout)(
                probs, deterministic=not training
            )
            out = jnp.einsum("bhst,bthd->bshd", probs, Vr).reshape(B, S, E)
        return dense("W_o")(out)


class AttentionPooling(nn.Module):
    """tanh-MLP scores -> softmax over the sequence -> weighted sum
    (reference: ``cin_attention.py:100-144``). [B, S, E] -> [B, E]."""

    embed_dim: int
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, transposed: bool = False):
        """x: [B, S, E], or [B, E, S] when ``transposed``.  Returns [B, E]."""
        hidden = self.hidden_dim or self.embed_dim
        glorot = nn.initializers.glorot_uniform()
        if transposed:
            h = DenseT(hidden, kernel_init=glorot, name="fc1")(x)
            h = jnp.tanh(h)
            scores = DenseT(1, use_bias=False, kernel_init=glorot, name="fc2")(h)
            weights = nn.softmax(scores, axis=-1)  # [B, 1, S]
            return jnp.einsum("bos,bes->be", weights, x)
        h = nn.Dense(
            hidden, kernel_init=glorot, bias_init=nn.initializers.zeros, name="fc1"
        )(x)
        h = jnp.tanh(h)
        scores = nn.Dense(1, use_bias=False, kernel_init=glorot, name="fc2")(h)
        weights = nn.softmax(scores, axis=1)  # [B, S, 1]
        return jnp.sum(weights * x, axis=1)


class CINAttention(nn.Module):
    """CIN cross layers + MHSA + residual + LayerNorm + attention pooling +
    projection back to featuremap_num (reference: ``cin_attention.py:147-318``).

    [B, M, E] -> [B, featuremap_num].
    """

    field_size: int
    embedding_size: int
    layer_size: Tuple[int, ...] = (128, 128)
    activation: str = "relu"
    split_half: bool = True
    num_heads: int = 4
    attn_dropout: float = 0.0
    use_layer_norm: bool = True
    use_residual: bool = True
    l2_reg: float = 1e-5
    seed: int = 1024

    def setup(self):
        if len(self.layer_size) == 0:
            raise ValueError(
                "layer_size must be a list(tuple) of length greater than 1"
            )
        self.kernels, self.biases = make_cin_params(
            self, self.field_size, self.layer_size, self.split_half
        )
        self.act = make_activation(self.activation, name="act")
        self.featuremap_num = cin_featuremap_num(self.layer_size, self.split_half)
        self.mhsa = MultiHeadSelfAttention(
            embed_dim=self.embedding_size,
            num_heads=self.num_heads,
            dropout=self.attn_dropout,
            name="mhsa",
        )
        if self.use_layer_norm:
            # normalize over the E axis of the transposed [B, E, S] block
            # (same math/params as the reference's last-axis LN on [B, S, E])
            self.layer_norm = nn.LayerNorm(
                reduction_axes=-2, feature_axes=-2, name="layer_norm"
            )
        self.attn_pooling = AttentionPooling(
            embed_dim=self.embedding_size,
            hidden_dim=self.embedding_size,
            name="attn_pooling",
        )
        self.output_proj = nn.Dense(
            self.featuremap_num,
            use_bias=False,
            kernel_init=nn.initializers.glorot_uniform(),
            name="output_proj",
        )

    def __call__(self, inputs, training: bool = False):
        # The whole block runs TRANSPOSED [B, E, S] (S on the 128-lane axis):
        # the row-major CIN stack emits this layout for free, and none of the
        # MHSA/residual/LN/pooling glue ever materializes the lane-padded
        # batch-major [B, S, E<=16] tensor (13-26x HBM bytes per op at
        # B=4096).  Measured with the dh-major kernel: xDeepFMAttention step
        # 39.6 -> 23.8 ms, V2 73.7 -> 41.4 ms (v5e, batch 4096).
        result = cin_feature_maps_t(
            inputs,
            self.kernels,
            self.biases,
            self.act,
            self.layer_size,
            self.split_half,
            training=training,
        )  # [B, E, featuremap_num]
        attn_output = self.mhsa(result, training=training, transposed=True)
        if self.use_residual:
            attn_output = attn_output + result
        if self.use_layer_norm:
            attn_output = self.layer_norm(attn_output)
        pooled = self.attn_pooling(attn_output, transposed=True)  # [B, E]
        return self.output_proj(pooled)  # [B, featuremap_num]


class CINAttentionV2(nn.Module):
    """V2: N stacked MHSA(+LN) blocks, no output projection — returns [B, E]
    (reference: ``cin_attention.py:321-467``)."""

    field_size: int
    embedding_size: int
    layer_size: Tuple[int, ...] = (128, 128)
    activation: str = "relu"
    split_half: bool = True
    num_heads: int = 4
    attn_dropout: float = 0.0
    use_layer_norm: bool = True
    use_residual: bool = True
    num_attn_layers: int = 1
    l2_reg: float = 1e-5
    seed: int = 1024

    def setup(self):
        if len(self.layer_size) == 0:
            raise ValueError(
                "layer_size must be a list(tuple) of length greater than 1"
            )
        self.kernels, self.biases = make_cin_params(
            self, self.field_size, self.layer_size, self.split_half
        )
        self.act = make_activation(self.activation, name="act")
        self.featuremap_num = cin_featuremap_num(self.layer_size, self.split_half)
        self.mhsa_layers = [
            MultiHeadSelfAttention(
                embed_dim=self.embedding_size,
                num_heads=self.num_heads,
                dropout=self.attn_dropout,
                name=f"mhsa_{i}",
            )
            for i in range(self.num_attn_layers)
        ]
        if self.use_layer_norm:
            self.layer_norms = [
                nn.LayerNorm(
                    reduction_axes=-2, feature_axes=-2, name=f"ln_{i}"
                )
                for i in range(self.num_attn_layers)
            ]
        self.attn_pooling = AttentionPooling(
            embed_dim=self.embedding_size,
            hidden_dim=self.embedding_size,
            name="attn_pooling",
        )

    def __call__(self, inputs, training: bool = False):
        # transposed [B, E, S] end to end — see CINAttention.__call__
        result = cin_feature_maps_t(
            inputs,
            self.kernels,
            self.biases,
            self.act,
            self.layer_size,
            self.split_half,
            training=training,
        )
        for i in range(self.num_attn_layers):
            attn_output = self.mhsa_layers[i](
                result, training=training, transposed=True
            )
            if self.use_residual:
                attn_output = attn_output + result
            if self.use_layer_norm:
                attn_output = self.layer_norms[i](attn_output)
            result = attn_output
        return self.attn_pooling(result, transposed=True)  # [B, E]
