"""Activations (reference: ``deepctr/layers/activation.py``).

TPU notes: these are all VPU elementwise ops that XLA fuses into the surrounding
matmuls; no custom kernels needed.  ``Dice`` carries BatchNorm running statistics
in the flax ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import flax.linen as nn
import jax.numpy as jnp


class Dice(nn.Module):
    """Data-adaptive activation from DIN (reference: ``activation.py:6-45``).

    dim=2: input ``[B, C]``; dim=3: input ``[B, F, C]`` (the reference transposes
    to channel-first for torch BatchNorm1d; flax normalizes over non-feature axes
    directly so no transpose is needed — identical math).
    """

    emb_size: int
    dim: int = 2
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.dim in (2, 3)
        if x.ndim != self.dim:  # fail fast like the reference's dim assert
            raise ValueError(
                f"Dice(dim={self.dim}) expects rank-{self.dim} input, "
                f"got rank {x.ndim}"
            )
        alpha_shape = (self.emb_size,) if self.dim == 2 else (self.emb_size, 1)
        alpha = self.param("alpha", nn.initializers.zeros, alpha_shape)
        if self.dim == 2:
            # BN over batch per channel (torch BatchNorm1d on [B, C]).
            x_p = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.9,
                epsilon=self.epsilon,
                name="bn",
            )(x)
            x_p = nn.sigmoid(x_p)
            return alpha * (1 - x_p) * x + x_p * x
        else:
            # [B, F, C]: reference transposes to [B, C, F] and BN's per channel C
            # over (B, F); flax BatchNorm with feature axis -1 does the same on
            # the untransposed layout. alpha has shape (C, 1) in the reference's
            # [B, C, F] layout -> (C,) broadcast over our [B, F, C].
            x_p = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.9,
                epsilon=self.epsilon,
                name="bn",
            )(x)
            x_p = nn.sigmoid(x_p)
            a = alpha[:, 0]
            return a * (1 - x_p) * x + x_p * x


class PReLU(nn.Module):
    """torch nn.PReLU: single learnable slope, init 0.25."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


def activation_fn(name: str) -> Callable:
    """Stateless activations by name (subset of ``activation.py:57-84``)."""
    name = name.lower()
    if name == "sigmoid":
        return nn.sigmoid
    if name == "linear":
        return lambda x: x
    if name == "relu":
        return nn.relu
    if name == "tanh":
        return nn.tanh
    if name == "leakyrelu":
        return nn.leaky_relu
    raise NotImplementedError(name)


def make_activation(
    act: Union[str, Callable],
    hidden_size: Optional[int] = None,
    dice_dim: int = 2,
    name: Optional[str] = None,
):
    """Factory mirroring ``activation_layer`` (``activation.py:57-84``).

    Returns either a stateless callable (applied as f(x)) or a parameterized
    module (Dice/PReLU) which must be called with ``(x, training)``.  Call via
    :func:`apply_activation`.
    """
    if callable(act):
        return act
    act_l = act.lower()
    if act_l == "dice":
        assert hidden_size is not None
        return Dice(emb_size=hidden_size, dim=dice_dim, name=name)
    if act_l == "prelu":
        return PReLU(name=name)
    return activation_fn(act_l)


def apply_activation(act, x, training: bool = False):
    if isinstance(act, (Dice, PReLU)):
        return act(x, training=training)
    return act(x)


class Identity(nn.Module):
    """Pass-through activation (reference ``activation.py:48-54``)."""

    def __call__(self, x):
        return x


# reference name for the str -> activation factory (``activation.py:57-84``)
activation_layer = make_activation
