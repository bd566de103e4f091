"""Feature-interaction op library (reference: ``deepctr/layers/interaction.py``).

All modules take stacked ``[B, F, E]`` field-embedding tensors (the torch
reference sometimes takes lists of ``[B, 1, E]``; stacking is the TPU-friendly
layout — one big tensor, static shapes, MXU-shaped contractions).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cin import cin_rows_contract
from .activations import apply_activation, make_activation
from .core import torch_bias_init, torch_linear_init
from .sequence import KMaxPooling


def _pair_indices(num_fields: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    row, col = [], []
    for i in range(num_fields - 1):
        for j in range(i + 1, num_fields):
            row.append(i)
            col.append(j)
    return tuple(row), tuple(col)


class FM(nn.Module):
    """Order-2 interactions: 0.5*((sum v)^2 - sum v^2) summed over the embedding
    axis (reference: ``interaction.py:12-34``). [B, F, E] -> [B, 1]."""

    @nn.compact
    def __call__(self, inputs):
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        cross_term = square_of_sum - sum_of_square
        return 0.5 * jnp.sum(cross_term, axis=2)


class BiInteractionPooling(nn.Module):
    """Same identity but keeps [B, 1, E] (reference: ``interaction.py:37-61``)."""

    @nn.compact
    def __call__(self, inputs):
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        return 0.5 * (square_of_sum - sum_of_square)


class SENETLayer(nn.Module):
    """Squeeze-excite over fields (reference: ``interaction.py:64-101``)."""

    filed_size: int
    reduction_ratio: int = 3
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions"
                % inputs.ndim
            )
        reduction_size = max(1, self.filed_size // self.reduction_ratio)
        Z = jnp.mean(inputs, axis=-1)
        A = nn.Dense(
            reduction_size, use_bias=False, kernel_init=torch_linear_init, name="fc1"
        )(Z)
        A = nn.relu(A)
        A = nn.Dense(
            self.filed_size, use_bias=False, kernel_init=torch_linear_init, name="fc2"
        )(A)
        A = nn.relu(A)
        return inputs * A[:, :, None]


class BilinearInteraction(nn.Module):
    """Pairwise ``(W v_i) * v_j`` (reference: ``interaction.py:104-156``).

    [B, F, E] -> [B, F*(F-1)/2, E].
    """

    filed_size: int
    embedding_size: int
    bilinear_type: str = "interaction"
    seed: int = 1024
    # flatten_output=True returns [B, P*E] (row-major (p, e), identical to
    # .reshape on the 3D output).  Lets the consumer concat/flatten in the
    # COMPACT layout instead of re-materializing the lane-padded [B, P, E].
    flatten_output: bool = False

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions"
                % inputs.ndim
            )
        F_ = self.filed_size
        E = self.embedding_size
        row, col = _pair_indices(F_)
        n_pairs = len(row)
        # Compute in transposed [E, P, B] space: with the batch on the lane
        # axis every tensor is COMPACT, where the natural [B, P, E] layout
        # pads E to 128 lanes and moves ~13x its logical bytes per op
        # (FiBiNET step 7.93 -> 3.27 ms at Criteo shapes, v5e-1).  Math is
        # identical to the reference's per-pair (W v_i) * v_j.
        xT = jnp.transpose(inputs, (2, 1, 0))  # [E, F, B]
        viT = _pair_select(xT, row, F_)  # [E, P, B]
        vjT = _pair_select(xT, col, F_)
        if self.bilinear_type == "all":
            W = self.param("bilinear_all", torch_linear_init, (E, E))
            pT = jnp.einsum("epb,ef->fpb", viT, W) * vjT
        elif self.bilinear_type == "each":
            W = self.param(
                "bilinear_each", _stacked_init(torch_linear_init, F_), (F_, E, E)
            )
            # project every FIELD once (F small batched matmuls), then select
            # pairs — a per-pair batched matmul reloads MXU weights P times
            proj = jnp.einsum("efb,fen->nfb", xT, W)  # [E_out, F, B]
            pT = _pair_select(proj, row, F_) * vjT
        elif self.bilinear_type == "interaction":
            W = self.param(
                "bilinear_inter",
                _stacked_init(torch_linear_init, n_pairs),
                (n_pairs, E, E),
            )
            # (a field-grouped [E, n_i*E] matmul per first-field was tried
            # and measured SLOWER than this single batched einsum — 6.96 vs
            # 6.51 ms FiBiNET step; 26 einsums + concat overhead beats the
            # per-pair weight reloads it saves.  Do not retry.)
            pT = jnp.einsum("epb,pef->fpb", viT, W) * vjT
        else:
            raise NotImplementedError
        out = jnp.transpose(pT, (2, 1, 0))  # [B, P, E]
        if self.flatten_output:
            return out.reshape(inputs.shape[0], n_pairs * E)
        return out


def _pair_select(xT, idx, F_):
    """[E, F, B] -> [E, P, B] rows via a one-hot matmul instead of a static
    gather: each field appears in ~F pairs, so the gather's BACKWARD is an
    XLA scatter-add of P slices (serialized on TPU); as a matmul both
    directions are single MXU contractions."""
    m = np.zeros((len(idx), F_), np.float32)
    m[np.arange(len(idx)), idx] = 1.0
    return jnp.einsum("efb,pf->epb", xT, jnp.asarray(m))


def _stacked_init(base_init, n):
    """Initialize an [n, ...] parameter as n independent base_init slices,
    mirroring the reference's per-module / per-layer-slice init loops."""

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, n)
        return jnp.stack([base_init(k, shape[1:], dtype) for k in keys])

    return init


def make_cin_params(module, field_size, layer_size, split_half):
    """Create the per-layer 1x1-conv compression params for a CIN stack.

    Shared by :class:`CIN` and the attention variants
    (``cin_attention.py:192-205`` mirrors ``interaction.py:189-201``).
    Returns (kernels, biases) lists; kernel i has shape [size_i, H_i * M].
    """
    field_nums = [field_size]
    kernels, biases = [], []
    for i, size in enumerate(layer_size):
        in_ch = field_nums[-1] * field_nums[0]
        bound = 1.0 / math.sqrt(in_ch)

        def uinit(key, shape, dtype=jnp.float32, b=bound):
            return jax.random.uniform(key, shape, dtype, -b, b)

        kernels.append(module.param(f"conv_w_{i}", uinit, (size, in_ch)))
        biases.append(module.param(f"conv_b_{i}", uinit, (size,)))
        if split_half:
            if i != len(layer_size) - 1 and size % 2 > 0:
                raise ValueError(
                    "layer_size must be even number except for the last layer "
                    "when split_half=True"
                )
            field_nums.append(size // 2)
        else:
            field_nums.append(size)
    return kernels, biases


def cin_feature_maps_rows(
    inputs, kernels, biases, act, layer_size, split_half, training=False
):
    """Run the CIN cross layers in row-major (b, d) form, returning the
    concatenated direct-connect feature maps as rows [B*D, featuremap_num]
    (reference ``interaction.py:207-245`` before the final sum-pool).

    The whole stack stays in row layout — one transpose in, one out — so the
    embedding axis never relayouts between layers.  CIN activations are
    stateless (the reference can't construct Dice here either), so applying
    them on rows is exact.
    """
    if inputs.ndim != 3:
        raise ValueError(
            "Unexpected inputs dimensions %d, expect to be 3 dimensions"
            % inputs.ndim
        )
    B, m, D = inputs.shape
    x0_rows = inputs.transpose(0, 2, 1).reshape(B * D, m)
    hidden = x0_rows
    final_result = []
    for i, size in enumerate(layer_size):
        x = cin_rows_contract(hidden, x0_rows, kernels[i], biases[i])
        curr_out = apply_activation(act, x, training=training)
        if split_half:
            if i != len(layer_size) - 1:
                # torch.split order (interaction.py:233-234): first half feeds
                # the next layer, second half direct-connects to the output.
                next_hidden = curr_out[:, : size // 2]
                direct_connect = curr_out[:, size // 2 :]
            else:
                direct_connect = curr_out
                next_hidden = None
        else:
            direct_connect = curr_out
            next_hidden = curr_out
        final_result.append(direct_connect)
        hidden = next_hidden
    return jnp.concatenate(final_result, axis=1)  # [B*D, Fm]


def cin_feature_maps(
    inputs, kernels, biases, act, layer_size, split_half, training=False
):
    """[B, featuremap_num, E] feature maps (used by the attention variants)."""
    B, m, D = inputs.shape
    rows = cin_feature_maps_rows(
        inputs, kernels, biases, act, layer_size, split_half, training
    )
    return rows.reshape(B, D, -1).transpose(0, 2, 1)


def cin_feature_maps_t(
    inputs, kernels, biases, act, layer_size, split_half, training=False
):
    """Transposed feature maps [B, E, featuremap_num] — a FREE reshape of the
    row-major CIN stack output (rows are (b, d)-major with the feature-map
    axis minor), so the attention variants consume the maps with S on the
    128-lane axis and never materialize the lane-padded [B, S, E<=16]
    batch-major tensor (13-26x HBM bytes per op at Criteo shapes)."""
    B, m, D = inputs.shape
    rows = cin_feature_maps_rows(
        inputs, kernels, biases, act, layer_size, split_half, training
    )
    return rows.reshape(B, D, -1)


def cin_featuremap_num(layer_size, split_half):
    return (
        sum(layer_size[:-1]) // 2 + layer_size[-1]
        if split_half
        else sum(layer_size)
    )


class CIN(nn.Module):
    """Compressed Interaction Network (reference: ``interaction.py:159-248``).

    [B, M, E] -> [B, featuremap_num] where featuremap_num =
    sum(layer_size[:-1])//2 + layer_size[-1] when split_half else sum(layer_size).

    The per-layer contraction dispatches through
    :func:`xdeepfm_tpu.ops.cin.cin_rows_contract` (XLA / fused / Pallas; the
    stack runs row-major [B*D, F] between layers).
    """

    field_size: int
    layer_size: Tuple[int, ...] = (128, 128)
    activation: str = "relu"
    split_half: bool = True
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

    def __call__(self, inputs, training: bool = False):
        B = inputs.shape[0]
        rows = cin_feature_maps_rows(
            inputs,
            self.kernels,
            self.biases,
            self.act,
            self.layer_size,
            self.split_half,
            training=training,
        )  # [B*D, Fm]
        # sum over the embedding axis == sum the D rows of each example
        return jnp.sum(rows.reshape(B, inputs.shape[2], -1), axis=1)


class AFMLayer(nn.Module):
    """Attention over pairwise products (reference: ``interaction.py:251-325``).

    [B, F, E] -> [B, 1].
    """

    in_features: int  # embedding size
    attention_factor: int = 4
    l2_reg_w: float = 0.0
    dropout_rate: float = 0.0
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        E = self.in_features
        F_ = inputs.shape[1]
        row, col = _pair_indices(F_)

        attention_W = self.param(
            "attention_W", nn.initializers.glorot_normal(), (E, self.attention_factor)
        )
        attention_b = self.param(
            "attention_b", nn.initializers.zeros, (self.attention_factor,)
        )
        projection_h = self.param(
            "projection_h", nn.initializers.glorot_normal(), (self.attention_factor, 1)
        )
        projection_p = self.param(
            "projection_p", nn.initializers.glorot_normal(), (E, 1)
        )

        # Transposed [E, P, B] space (batch on lanes): the natural [B, P, E]
        # layout pads E to 128 lanes and re-materializes ~13x the logical
        # bytes per op at P = F(F-1)/2 pairs.  Math identical to the
        # reference (interaction.py:296-317).
        xT = jnp.transpose(inputs, (2, 1, 0))  # [E, F, B]
        biT = _pair_select(xT, row, F_) * _pair_select(xT, col, F_)  # [E,P,B]
        attention_temp = nn.relu(
            jnp.einsum("epb,ea->apb", biT, attention_W)
            + attention_b[:, None, None]
        )
        att_score = nn.softmax(
            jnp.einsum("apb,ah->hpb", attention_temp, projection_h)[0], axis=0
        )  # [P, B], softmax over pairs
        attention_output = jnp.einsum("pb,epb->eb", att_score, biT)  # [E, B]
        attention_output = nn.Dropout(rate=self.dropout_rate)(
            attention_output, deterministic=not training
        )
        return jnp.einsum("eb,eo->bo", attention_output, projection_p)


class InteractingLayer(nn.Module):
    """AutoInt multi-head self-attention over fields with residual
    (reference: ``interaction.py:328-394``). [B, F, E] -> [B, F, E]."""

    embedding_size: int
    head_num: int = 2
    use_res: bool = True
    scaling: bool = False
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if self.head_num <= 0:
            raise ValueError("head_num must be a int > 0")
        if self.embedding_size % self.head_num != 0:
            raise ValueError(
                "embedding_size is not an integer multiple of head_num!"
            )
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions"
                % inputs.ndim
            )
        E = self.embedding_size
        att_size = E // self.head_num
        init = nn.initializers.normal(stddev=0.05)
        W_Query = self.param("W_Query", init, (E, E))
        W_Key = self.param("W_Key", init, (E, E))
        W_Value = self.param("W_Value", init, (E, E))

        B, F_, _ = inputs.shape
        scale = att_size**-0.5 if self.scaling else 1.0
        from ..ops import lane_attention as _lane

        if _lane.use_lane_attention(F_):
            # lane-batched kernel: batch on the 128-lane axis, zero HBM
            # intermediates (see ops/lane_attention.py) — AutoInt train step
            # 12.2 -> 4.06 ms, DIFM 5.77 -> 3.03 ms at Criteo shapes (v5e-1)
            result = _lane.lane_mhsa_packed(
                inputs @ W_Query, inputs @ W_Key, inputs @ W_Value,
                scale, self.head_num,
            )
        else:
            def heads(x):
                return x.reshape(
                    B, F_, self.head_num, att_size
                ).transpose(0, 2, 1, 3)

            querys = heads(inputs @ W_Query)  # [B, H, F, a]
            keys = heads(inputs @ W_Key)
            values = heads(inputs @ W_Value)

            inner = jnp.einsum("bhik,bhjk->bhij", querys, keys) * scale
            scores = nn.softmax(inner, axis=-1)
            result = jnp.einsum("bhij,bhjk->bhik", scores, values)
            result = result.transpose(0, 2, 1, 3).reshape(B, F_, E)
        if self.use_res:
            W_Res = self.param("W_Res", init, (E, E))
            result = result + inputs @ W_Res
        return nn.relu(result)


class CrossNet(nn.Module):
    """DCN cross layers (reference: ``interaction.py:397-453``).

    [B, d] -> [B, d]; vector: x_{l+1} = x0 * (x_l . w) + b + x_l;
    matrix: x_{l+1} = x0 * (W x_l + b) + x_l.
    """

    in_features: int
    layer_num: int = 2
    parameterization: str = "vector"
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        d = self.in_features
        if self.parameterization == "vector":
            kshape = (self.layer_num, d, 1)
        elif self.parameterization == "matrix":
            kshape = (self.layer_num, d, d)
        else:
            raise ValueError("parameterization should be 'vector' or 'matrix'")
        kernels = self.param(
            "kernels",
            _stacked_init(nn.initializers.glorot_normal(), self.layer_num),
            kshape,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.layer_num, d, 1))

        x_0 = inputs[:, :, None]
        x_l = x_0
        for i in range(self.layer_num):
            if self.parameterization == "vector":
                xl_w = jnp.einsum("bdo,dk->bko", x_l, kernels[i])  # [B,1,1]
                dot_ = x_0 * xl_w  # matmul(x_0 [B,d,1], xl_w [B,1,1])
                x_l = dot_ + bias[i] + x_l
            else:
                xl_w = jnp.einsum("de,beo->bdo", kernels[i], x_l)
                dot_ = xl_w + bias[i]
                x_l = x_0 * dot_ + x_l
        return x_l[:, :, 0]


class CrossNetMix(nn.Module):
    """DCN-Mix low-rank MoE cross layers (reference: ``interaction.py:456-534``)."""

    in_features: int
    low_rank: int = 32
    num_experts: int = 4
    layer_num: int = 2

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        d, r, K, L = self.in_features, self.low_rank, self.num_experts, self.layer_num

        def layer_init(key, shape, dtype=jnp.float32):
            # torch xavier_normal_ on the whole 3D [K, a, b] layer slice
            # (reference interaction.py:489-492): torch's 3D fans are
            # fan_in = a*b, fan_out = K*b — NOT K independent 2D draws
            # (per-slice glorot measured 4-5.5x larger std at DCN-Mix shapes)
            K_, a, b = shape
            std = (2.0 / (a * b + K_ * b)) ** 0.5
            return jax.random.normal(key, shape, dtype) * std

        U = self.param("U_list", _stacked_init(layer_init, L), (L, K, d, r))
        V = self.param("V_list", _stacked_init(layer_init, L), (L, K, d, r))
        C = self.param("C_list", _stacked_init(layer_init, L), (L, K, r, r))
        gate_W = self.param(
            "gating", _stacked_init(torch_linear_init, K), (K, d, 1)
        )
        bias = self.param("bias", nn.initializers.zeros, (L, d, 1))

        x_0 = inputs[:, :, None]  # [B, d, 1]
        x_l = x_0
        for i in range(L):
            # gating scores: [B, K]
            gate = jnp.einsum("bdo,kdo->bk", x_l, gate_W)
            # expert outputs, batched over K: V^T x -> tanh -> C -> tanh -> U
            v_x = jnp.einsum("kdr,bdo->bkr", V[i], x_l)
            v_x = jnp.tanh(v_x)
            v_x = jnp.einsum("krs,bks->bkr", C[i], v_x)
            v_x = jnp.tanh(v_x)
            uv_x = jnp.einsum("kdr,bkr->bkd", U[i], v_x)
            dot_ = uv_x + bias[i][None, :, 0][:, None, :]  # [B, K, d]
            dot_ = x_0[:, None, :, 0] * dot_
            moe_out = jnp.einsum("bkd,bk->bd", dot_, nn.softmax(gate, axis=1))
            x_l = moe_out[:, :, None] + x_l
        return x_l[:, :, 0]


class InnerProductLayer(nn.Module):
    """PNN pairwise inner products (reference: ``interaction.py:537-577``)."""

    reduce_sum: bool = True

    @nn.compact
    def __call__(self, inputs):
        F_ = inputs.shape[1]
        row, col = _pair_indices(F_)
        if self.reduce_sum:
            # transposed [E, P, B] space + one-hot pair selection (see
            # _pair_select / BilinearInteraction layout notes)
            xT = jnp.transpose(inputs, (2, 1, 0))
            innerT = jnp.sum(
                _pair_select(xT, row, F_) * _pair_select(xT, col, F_), axis=0
            )  # [P, B]
            return jnp.transpose(innerT)[:, :, None]
        # one-hot pair selection here too: a static fancy-index gather's
        # backward is a serialized per-slice scatter-add on TPU
        xT = jnp.transpose(inputs, (2, 1, 0))
        prodT = _pair_select(xT, row, F_) * _pair_select(xT, col, F_)
        return jnp.transpose(prodT, (2, 1, 0))  # [B, P, E]


class OutterProductLayer(nn.Module):
    """PNN kernel-weighted outer products (reference: ``interaction.py:580-672``).

    [B, F, E] -> [B, F*(F-1)/2].
    """

    field_size: int
    embedding_size: int
    kernel_type: str = "mat"
    seed: int = 1024

    @nn.compact
    def __call__(self, inputs):
        F_ = self.field_size
        E = self.embedding_size
        num_pairs = F_ * (F_ - 1) // 2
        row, col = _pair_indices(F_)
        # transposed [E, P, B] space + one-hot pair selection (see
        # _pair_select / BilinearInteraction layout notes)
        xT = jnp.transpose(inputs, (2, 1, 0))
        pT = _pair_select(xT, row, F_)  # [E, P, B]
        qT = _pair_select(xT, col, F_)
        if self.kernel_type == "mat":
            kernel = self.param(
                "kernel", nn.initializers.glorot_uniform(), (E, num_pairs, E)
            )
            # torch (interaction.py:630-660): tmp[b,e1,p] = sum_e2 p[b,p,e2] *
            # k[e1,p,e2]; out[b,p] = sum_e1 tmp[b,e1,p] * q[b,p,e1]
            kpT = jnp.einsum("epb,fpe,fpb->pb", pT, kernel, qT)
        elif self.kernel_type == "vec":
            kernel = self.param(
                "kernel", nn.initializers.glorot_uniform(), (num_pairs, E)
            )
            kpT = jnp.einsum("epb,pe,epb->pb", pT, kernel, qT)
        elif self.kernel_type == "num":
            kernel = self.param(
                "kernel", nn.initializers.glorot_uniform(), (num_pairs, 1)
            )
            kpT = jnp.sum(pT * qT, axis=0) * kernel  # [P, B] * [P, 1]
        else:
            raise ValueError(self.kernel_type)
        return jnp.transpose(kpT)  # [B, P]


class ConvLayer(nn.Module):
    """CCPM conv stack: SAME conv + tanh + KMaxPooling over the field axis
    (reference: ``interaction.py:675-717``).

    Input [B, F, E, 1] (NHWC; torch uses NCHW [B, 1, F, E]) ->
    output [B, F', E, last_filters].
    """

    field_size: int
    conv_kernel_width: Tuple[int, ...]
    conv_filters: Tuple[int, ...]

    @staticmethod
    def output_field_size(field_size, n_layers):
        filed_shape = field_size
        for i in range(1, n_layers + 1):
            k = (
                max(1, int((1 - pow(i / n_layers, n_layers - i)) * field_size))
                if i < n_layers
                else 3
            )
            filed_shape = min(k, filed_shape)
        return filed_shape

    @nn.compact
    def __call__(self, inputs):
        x = inputs
        n = self.field_size
        l = len(self.conv_filters)
        filed_shape = n
        for i in range(1, l + 1):
            filters = self.conv_filters[i - 1]
            width = self.conv_kernel_width[i - 1]
            k = max(1, int((1 - pow(i / l, l - i)) * n)) if i < l else 3
            x = nn.Conv(
                features=filters,
                kernel_size=(width, 1),
                strides=(1, 1),
                padding="SAME",
                kernel_init=nn.initializers.glorot_uniform(),
                # torch Conv2d default bias U(±1/sqrt(in_ch*kh*kw)) — the
                # reference keeps it (only the weight is re-inited)
                bias_init=torch_bias_init(x.shape[-1] * width * 1),
                name=f"conv_{i}",
            )(x)
            x = jnp.tanh(x)
            x = KMaxPooling(k=min(k, filed_shape), axis=1)(x)
            filed_shape = min(k, filed_shape)
        return x


class LogTransformLayer(nn.Module):
    """AFN logarithmic neurons (reference: ``interaction.py:720-757``).

    [B, F, E] -> [B, ltl_hidden_size * E].
    """

    field_size: int
    embedding_size: int
    ltl_hidden_size: int

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        w = self.param(
            "ltl_weights",
            nn.initializers.normal(stddev=0.1),
            (self.field_size, self.ltl_hidden_size),
        )
        b = self.param(
            "ltl_biases", nn.initializers.zeros, (self.ltl_hidden_size,)
        )
        x = jnp.clip(jnp.abs(inputs), 1e-7, None)  # [B, F, E]
        x = jnp.log(x)
        # BN per embedding channel over (batch, fields): feature axis = -1.
        x = nn.BatchNorm(
            use_running_average=not training, momentum=0.9, epsilon=1e-5, name="bn0"
        )(x)
        x = jnp.einsum("bfe,fh->beh", x, w) + b[None, None, :]
        x = jnp.exp(x)
        # torch bn[1] is BatchNorm1d(E) on [B, E, H]: channel axis 1 here.
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=0.9,
            epsilon=1e-5,
            axis=1,
            name="bn1",
        )(x)
        return x.reshape(x.shape[0], -1)
