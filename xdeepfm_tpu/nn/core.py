"""Core layers (reference: ``deepctr/layers/core.py``).

DNN / PredictionLayer / LocalActivationUnit as flax modules.  All matmuls are
MXU-shaped (batch-major, static shapes) and elementwise tails fuse under XLA.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import apply_activation, make_activation


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    For flax kernels of shape (in, out) fan_in = shape[0]; for biases the caller
    should use :func:`torch_bias_init` with the explicit fan_in.
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DNN(nn.Module):
    """MLP: Dense -> (BN) -> activation -> dropout per layer
    (reference: ``core.py:67-134``).

    Weight init: normal(std=init_std) as in ``core.py:114-116``; biases keep the
    torch Linear default U(±1/sqrt(fan_in)) which the reference does not re-init.
    """

    inputs_dim: int
    hidden_units: Tuple[int, ...]
    activation: Union[str, Callable] = "relu"
    l2_reg: float = 0.0
    dropout_rate: float = 0.0
    use_bn: bool = False
    init_std: float = 1e-4
    dice_dim: int = 3
    seed: int = 1024

    def setup(self):
        if len(self.hidden_units) == 0:
            raise ValueError("hidden_units is empty!!")
        units = [self.inputs_dim] + list(self.hidden_units)
        self.linears = [
            nn.Dense(
                units[i + 1],
                kernel_init=nn.initializers.normal(stddev=self.init_std),
                bias_init=torch_bias_init(units[i]),
                name=f"linear_{i}",
            )
            for i in range(len(units) - 1)
        ]
        if self.use_bn:
            self.bns = [
                nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"bn_{i}")
                for i in range(len(units) - 1)
            ]
        self.acts = [
            make_activation(
                self.activation, units[i + 1], self.dice_dim, name=f"act_{i}"
            )
            for i in range(len(units) - 1)
        ]
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(self, x, training: bool = False):
        h = x
        for i, lin in enumerate(self.linears):
            h = lin(h)
            if self.use_bn:
                h = self.bns[i](h, use_running_average=not training)
            h = apply_activation(self.acts[i], h, training=training)
            h = self.dropout(h, deterministic=not training)
        return h

    @property
    def supports_transposed(self) -> bool:
        """True when :meth:`call_t` is valid: no BatchNorm and a purely
        elementwise activation (Dice/PReLU normalize per feature axis, which
        the transposed layout would change)."""
        return (
            not self.use_bn
            and isinstance(self.activation, str)
            and self.activation.lower()
            in ("relu", "sigmoid", "linear", "tanh", "leakyrelu")
        )

    def call_t(self, x_t, training: bool = False):
        """Transposed evaluation over [..., C, N] inputs (features on the
        second-minor axis, batch/lanes minor) — identical math and params to
        ``__call__`` on [..., N, C].

        TPU rationale (CLAUDE.md layout playbook): the sequence models run
        MLPs over [B*T, C~20..64] activations whose batch-major layout pads
        C to 128 lanes (2-6x HBM bytes on every pass, 128x for the final
        [.., 1] scores); in [T, C, B] form C sits on sublanes (pads to a
        multiple of 8) and the batch rides the lane axis unpadded.
        """
        assert self.supports_transposed
        if self.is_initializing():
            # create params via the canonical path once; shapes agree
            self(jnp.zeros((1, self.inputs_dim), x_t.dtype), training=False)
        h = x_t
        for i, lin in enumerate(self.linears):
            k = lin.variables["params"]["kernel"]
            b = lin.variables["params"]["bias"]
            h = jnp.einsum("...cn,ch->...hn", h, k) + b[:, None]
            h = apply_activation(self.acts[i], h, training=training)
            h = self.dropout(h, deterministic=not training)
        return h


class PredictionLayer(nn.Module):
    """Adds a scalar bias; sigmoid iff task == 'binary'
    (reference: ``core.py:137-160``)."""

    task: str = "binary"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.task not in ["binary", "multiclass", "regression"]:
            raise ValueError("task must be binary,multiclass or regression")
        out = x
        if self.use_bias:
            bias = self.param("global_bias", nn.initializers.zeros, (1,))
            out = out + bias
        if self.task == "binary":
            out = nn.sigmoid(out)
        return out


class LocalActivationUnit(nn.Module):
    """DIN attention MLP over [q, k, q-k, q*k] (reference: ``core.py:10-64``).

    query: [B, 1, E]; user_behavior: [B, T, E] -> scores [B, T, 1].
    """

    hidden_units: Tuple[int, ...] = (64, 32)
    embedding_dim: int = 4
    activation: Union[str, Callable] = "sigmoid"
    dropout_rate: float = 0.0
    dice_dim: int = 3
    l2_reg: float = 0.0
    use_bn: bool = False

    def setup(self):
        self.dnn = DNN(
            inputs_dim=4 * self.embedding_dim,
            hidden_units=self.hidden_units,
            activation=self.activation,
            l2_reg=self.l2_reg,
            dropout_rate=self.dropout_rate,
            dice_dim=self.dice_dim,
            use_bn=self.use_bn,
            name="dnn",
        )
        self.dense = nn.Dense(
            1,
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(self.hidden_units[-1]),
            name="dense",
        )

    def __call__(self, query, user_behavior, training: bool = False):
        T = user_behavior.shape[1]
        queries = jnp.broadcast_to(query, (query.shape[0], T, query.shape[2]))
        att_input = jnp.concatenate(
            [queries, user_behavior, queries - user_behavior, queries * user_behavior],
            axis=-1,
        )
        att_out = self.dnn(att_input, training=training)
        return self.dense(att_out)  # [B, T, 1]

    @property
    def supports_transposed(self) -> bool:
        return self.dnn.supports_transposed

    def call_t(self, query_t, behavior_t, training: bool = False):
        """Transposed lane-space scoring: query_t [E, B], behavior_t
        [T, E, B] -> scores [T, 1, B].  Same params/math as ``__call__``;
        the [q, k, q-k, q*k] concat lands on the sublane axis so none of the
        MLP activations pad their ~40-64 features to 128 lanes."""
        T = behavior_t.shape[0]
        q = jnp.broadcast_to(query_t[None], behavior_t.shape)
        att_input = jnp.concatenate(
            [q, behavior_t, q - behavior_t, q * behavior_t], axis=1
        )  # [T, 4E, B]
        att_out = self.dnn.call_t(att_input, training=training)
        if self.is_initializing():
            self.dense(jnp.zeros((1, self.hidden_units[-1]), att_out.dtype))
        k = self.dense.variables["params"]["kernel"]   # [hu, 1]
        b = self.dense.variables["params"]["bias"]     # [1]
        return (
            jnp.einsum("thb,ho->tob", att_out, k) + b[:, None]
        )  # [T, 1, B]


class Conv2dSame(nn.Module):
    """TF-style SAME-padding 2-D conv (reference ``core.py:163-185`` — a torch
    shim for what flax's NHWC Conv does natively).  Input [B, H, W, C]."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        # reference init parity: explicit xavier_uniform_ weights
        # (core.py:172) + torch Conv2d's default U(±1/sqrt(fan_in)) bias
        kh, kw = self.kernel_size
        fan_in = x.shape[-1] * kh * kw
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=torch_bias_init(fan_in),
        )(x)
