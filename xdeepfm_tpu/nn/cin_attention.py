"""Attention-pooled CIN (reference: ``deepctr/layers/cin_attention.py``).

Replaces CIN's sum-pool over the embedding axis with MHSA over the feature-map
axis + attention pooling.  Feature-map counts are <= a few hundred, so this is a
small-sequence attention — no sequence sharding needed (SURVEY.md §5).

On single-chip TPU the whole post-CIN block (q/k/v/o projections, residual,
LayerNorm, attention pooling — for V2, every stacked layer) runs as ONE fused
Pallas kernel (``ops/attn_block_pallas.py``): the [B, E, S] activation is read
from HBM once instead of being re-materialized by each glue op.  All modules
are setup-based (not @nn.compact) so the SAME parameter tree exists whichever
path executes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import make_activation
from .interaction import (
    cin_feature_maps,
    cin_feature_maps_t,
    cin_featuremap_num,
    make_cin_params,
)


class DenseT(nn.Module):
    """Linear layer whose params match ``nn.Dense`` (kernel [in, out] +
    optional bias) but whose default ``__call__`` consumes the CHANNEL axis of
    a transposed [B, E, S] tensor; ``last_axis`` applies the classic
    last-axis contraction for batch-major inputs.  Setup-based so the fused
    block can read the weights without running either contraction."""

    features: int
    in_features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.glorot_uniform()

    def setup(self):
        self.kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )

    def __call__(self, x_t):
        y = jnp.einsum("bes,ef->bfs", x_t, self.kernel)
        if self.use_bias:
            y = y + self.bias[None, :, None]
        return y

    def last_axis(self, x):
        y = x @ self.kernel
        if self.use_bias:
            y = y + self.bias
        return y


class LayerNormT(nn.Module):
    """LayerNorm over the E axis of a transposed [B, E, S] tensor.  Params
    ("scale", "bias", shape [E]) and numerics (fast variance, eps) match
    ``nn.LayerNorm(reduction_axes=-2, feature_axes=-2)``, which it replaces
    so the fused block can read the weights directly."""

    features: int
    epsilon: float = 1e-5  # torch nn.LayerNorm default (reference parity)

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def __call__(self, x):
        mu = jnp.mean(x, axis=-2, keepdims=True)
        var = jnp.mean(x * x, axis=-2, keepdims=True) - mu * mu
        y = (x - mu) * jax.lax.rsqrt(var + self.epsilon)
        return y * self.scale[None, :, None] + self.bias[None, :, None]


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

    def setup(self):
        glorot = nn.initializers.glorot_uniform()
        mk = lambda: DenseT(
            self.embed_dim, self.embed_dim, use_bias=False, kernel_init=glorot
        )
        self.W_q = mk()
        self.W_k = mk()
        self.W_v = mk()
        self.W_o = mk()
        self.drop = nn.Dropout(rate=self.dropout)

    def projection_kernels(self):
        """Raw (kernel_q, kernel_k, kernel_v, kernel_o) for the fused block."""
        return (
            self.W_q.kernel, self.W_k.kernel, self.W_v.kernel, self.W_o.kernel
        )

    def __call__(self, x, training: bool = False, transposed: bool = False):
        """x: [B, S, E] batch-major, or [B, E, S] when ``transposed`` (S on
        the lane axis — the layout the CIN-attention glue runs in)."""
        num_heads = get_valid_num_heads(self.embed_dim, self.num_heads)
        head_dim = self.embed_dim // num_heads
        scale = math.sqrt(head_dim)
        # q/k/v stay in the projections' packed-head layout end to end (head
        # transposes materialized ~11 ms/step of relayout copies at B=4096 on
        # v5e, whichever side performed them); in transposed form the
        # [B, E, S] -> [B*heads, dh, S] head split is a free reshape
        if transposed:
            B, E, S = x.shape
            Q, K, V = self.W_q(x), self.W_k(x), self.W_v(x)
        else:
            B, S, E = x.shape
            Q = self.W_q.last_axis(x)
            K = self.W_k.last_axis(x)
            V = self.W_v.last_axis(x)
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
            probs = self.drop(probs, deterministic=not training)
            out = jnp.einsum("bhst,bhdt->bhds", probs, Vr).reshape(B, E, S)
        else:
            Qr = Q.reshape(B, S, num_heads, head_dim)
            Kr = K.reshape(B, S, num_heads, head_dim)
            Vr = V.reshape(B, S, num_heads, head_dim)
            scores = jnp.einsum("bshd,bthd->bhst", Qr, Kr) / scale
            probs = nn.softmax(scores, axis=-1)
            probs = self.drop(probs, deterministic=not training)
            out = jnp.einsum("bhst,bthd->bshd", probs, Vr).reshape(B, S, E)
        return self.W_o(out) if transposed else self.W_o.last_axis(out)


class AttentionPooling(nn.Module):
    """tanh-MLP scores -> softmax over the sequence -> weighted sum
    (reference: ``cin_attention.py:100-144``). [B, S, E] -> [B, E]."""

    embed_dim: int
    hidden_dim: Optional[int] = None

    def setup(self):
        hidden = self.hidden_dim or self.embed_dim
        glorot = nn.initializers.glorot_uniform()
        self.fc1 = DenseT(hidden, self.embed_dim, kernel_init=glorot)
        self.fc2 = DenseT(1, hidden, use_bias=False, kernel_init=glorot)

    def pooling_params(self):
        """(W1 [E, hidden], b1 [hidden], w2 [hidden, 1]) for the fused
        block."""
        return self.fc1.kernel, self.fc1.bias, self.fc2.kernel

    def __call__(self, x, transposed: bool = False):
        """x: [B, S, E], or [B, E, S] when ``transposed``.  Returns [B, E]."""
        if transposed:
            h = jnp.tanh(self.fc1(x))
            scores = self.fc2(h)
            weights = nn.softmax(scores, axis=-1)  # [B, 1, S]
            return jnp.einsum("bos,bes->be", weights, x)
        h = jnp.tanh(self.fc1.last_axis(x))
        scores = self.fc2.last_axis(h)
        weights = nn.softmax(scores, axis=1)  # [B, S, 1]
        return jnp.sum(weights * x, axis=1)


def _fused_block_apply(x_t, mhsas, layer_norms, pooling, num_heads,
                      use_residual, use_layer_norm):
    """Run the fused attention-block kernel over transposed CIN output.

    ``mhsas``/``layer_norms``: per-layer module lists (len L).  Returns the
    pooled [B, E] or None when the fused path is unavailable.
    """
    from ..ops import attn_block_pallas as abp

    B, E, S = x_t.shape
    if not abp.use_fused_block(seq_len=S):
        return None
    heads = get_valid_num_heads(E, num_heads)
    dh = E // heads
    wq, wk, wv, wo = [], [], [], []
    for m in mhsas:
        kq, kk, kv, ko = m.projection_kernels()
        wq.append(abp.pack_projection(kq, heads))
        wk.append(abp.pack_projection(kk, heads))
        wv.append(abp.pack_projection(kv, heads))
        wo.append(abp.pack_out_projection(ko, heads))
    L = len(mhsas)
    wq = jnp.concatenate(wq, axis=0)     # [L*H, E, dh]
    wk = jnp.concatenate(wk, axis=0)
    wv = jnp.concatenate(wv, axis=0)
    wo = jnp.concatenate(wo, axis=0)     # [L*H, dh, E]
    if use_layer_norm:
        gamma = jnp.stack([ln.scale for ln in layer_norms])[:, :, None]
        beta = jnp.stack([ln.bias for ln in layer_norms])[:, :, None]
    else:
        gamma = jnp.ones((L, E, 1), jnp.float32)
        beta = jnp.zeros((L, E, 1), jnp.float32)
    w1, b1, w2 = pooling.pooling_params()
    if mhsas[0].is_initializing():
        # touching the params above created them; skip the kernel so model
        # construction doesn't pay a Mosaic compile for a throwaway value
        return jnp.zeros((B, E), x_t.dtype)
    cfg = abp.BlockCfg(
        layers=L, heads=heads, scale=1.0 / math.sqrt(dh),
        use_residual=use_residual, use_layer_norm=use_layer_norm, eps=1e-5,
    )
    return abp.attn_block(
        cfg, x_t, wq, wk, wv, wo, gamma, beta, w1,
        b1[:, None], w2,
    )


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
        )
        if self.use_layer_norm:
            # normalize over the E axis of the transposed [B, E, S] block
            # (same math/params as the reference's last-axis LN on [B, S, E])
            self.layer_norm = LayerNormT(self.embedding_size)
        self.attn_pooling = AttentionPooling(
            embed_dim=self.embedding_size,
            hidden_dim=self.embedding_size,
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
        pooled = None
        if self.attn_dropout == 0.0 or not training:
            pooled = _fused_block_apply(
                result, [self.mhsa],
                [self.layer_norm] if self.use_layer_norm else [],
                self.attn_pooling, self.num_heads, self.use_residual,
                self.use_layer_norm,
            )
        if pooled is None:
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
                LayerNormT(self.embedding_size, name=f"ln_{i}")
                for i in range(self.num_attn_layers)
            ]
        self.attn_pooling = AttentionPooling(
            embed_dim=self.embedding_size,
            hidden_dim=self.embedding_size,
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
        # V2 stays on the round-2 unfused path: a stacked-L fused kernel
        # measured 40.1 ms and a mixed last-layer-fused graph 52.2 ms vs
        # 37.3 unfused at bench shapes (the fused block wins only for the
        # single-layer V1 shape; see attn_block_pallas docstring).  The
        # single-layer case still routes through the fused block when the
        # model is configured with num_attn_layers == 1.
        if self.num_attn_layers == 1 and (
            self.attn_dropout == 0.0 or not training
        ):
            pooled = _fused_block_apply(
                result, [self.mhsa_layers[0]],
                [self.layer_norms[0]] if self.use_layer_norm else [],
                self.attn_pooling, self.num_heads, self.use_residual,
                self.use_layer_norm,
            )
            if pooled is not None:
                return pooled
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
