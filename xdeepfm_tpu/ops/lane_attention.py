"""Lane-batched attention kernel for SMALL sequence lengths.

The zoo's field-axis MHSA (AutoInt / DIFM ``InteractingLayer``, reference
``deepctr/layers/interaction.py:328-394``) runs attention over S ~ 26-40
field "tokens" with head dims of ~5.  Both the XLA einsum lowering and the
per-(batch*head)-pair MXU kernel (``attention_pallas.small_attention``, built
for the CIN-attention's S ~ 266) are overhead-bound here: every tensor pads
its 5- or 10-wide minor axis to 128 lanes, so each of the ~10 HBM-level ops
per layer moves 13-26x its logical bytes, and per-pair matmuls cost
M*ceil(S/128) MXU cycles for tiny S.

This kernel instead puts the BATCH on the lane axis: operands live as
[H, dh, S, B] (B minor -> 128 lanes, S on sublanes, dh/H unrolled), one grid
program handles a (head, 128-sample) tile, and the entire attention —
score FMAs, softmax over the S sublane axis, probability-weighted sums —
runs on the VPU with zero HBM intermediates and zero lane padding.  For
S <= ~64 the whole [S, S, 128] score block is a few hundred KB of VMEM.
The backward recomputes the softmax (flash-style) so HBM traffic is just
q/k/v/g and the three input gradients.

Not for large S: at S ~ 266 (CIN-attention) the VPU FLOP bound matches the
MXU kernel's padded cost and the score block outgrows VMEM; use
``attention_pallas.small_attention`` there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


LANE_BLOCK = 128
MAX_S = 64  # score block [S, S, 128] must stay a few MB of VMEM


# NOTE: Mosaic rejects IMPLICIT rank-3 broadcasts (`a[:, None, :] * b`) with
# "Only 2D gather is supported"; every broadcast below is an explicit
# jnp.broadcast_to, which lowers fine.


def _bi(x2, S):
    # [S, LB] -> [S(i), S(j), LB] broadcast along the j (sublane) axis
    return jnp.broadcast_to(x2[:, None, :], (S,) + x2.shape)


def _bj(x2, S):
    # [S, LB] -> [S(i), S(j), LB] broadcast along the leading i axis
    return jnp.broadcast_to(x2[None, :, :], (S,) + x2.shape)


def _softmax_sublane(s, S):
    # s: [S_i, S_j, LB]; normalize over the j (sublane) axis
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - jnp.broadcast_to(m, s.shape))
    z = jnp.sum(e, axis=1, keepdims=True)
    return e / jnp.broadcast_to(z, e.shape)


def _scores(q, k, scale, dh, S):
    # scores[i, j, b] = sum_d q[d, i, b] * k[d, j, b]
    s = _bi(q[0], S) * _bj(k[0], S)
    for d in range(1, dh):
        s += _bi(q[d], S) * _bj(k[d], S)
    return _softmax_sublane(s * scale, S)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, dh, S):
    q = q_ref[0]  # [dh, S, LB]
    k = k_ref[0]
    v = v_ref[0]
    p = _scores(q, k, scale, dh, S)  # [S, S, LB]
    for d in range(dh):
        o_ref[0, d] = jnp.sum(p * _bj(v[d], S), axis=1)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale, dh, S):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    p = _scores(q, k, scale, dh, S)  # recomputed; never hits HBM
    # dv[d, j, b] = sum_i p[i, j, b] g[d, i, b]
    for d in range(dh):
        dv_ref[0, d] = jnp.sum(p * _bi(g[d], S), axis=0)
    # dp[i, j, b] = sum_d g[d, i, b] v[d, j, b]
    dp = _bi(g[0], S) * _bj(v[0], S)
    for d in range(1, dh):
        dp += _bi(g[d], S) * _bj(v[d], S)
    r = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = (dp - jnp.broadcast_to(r, dp.shape)) * p * scale
    # dq[d, i, b] = sum_j ds[i, j, b] k[d, j, b]
    # dk[d, j, b] = sum_i ds[i, j, b] q[d, i, b]
    for d in range(dh):
        dq_ref[0, d] = jnp.sum(ds * _bj(k[d], S), axis=1)
        dk_ref[0, d] = jnp.sum(ds * _bi(q[d], S), axis=0)


def _specs(H, dh, S, LB):
    blk = pl.BlockSpec(
        (1, dh, S, LB), lambda ib, h: (h, 0, 0, ib), memory_space=pltpu.VMEM
    )
    return blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lane_attention(q, k, v, scale):
    """softmax(q k^T * scale) v over [H, dh, S, B] operands (B on lanes)."""
    out, _ = _la_fwd(q, k, v, scale)
    return out


def _la_fwd(q, k, v, scale):
    H, dh, S, B = q.shape
    assert B % LANE_BLOCK == 0, "pad batch to a multiple of 128 outside"
    blk = _specs(H, dh, S, LANE_BLOCK)
    kernel = functools.partial(_fwd_kernel, scale=scale, dh=dh, S=S)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, dh, S, B), jnp.float32),
        grid=(B // LANE_BLOCK, H),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, k, v)
    return out, (q, k, v)


def _la_bwd(scale, res, g):
    q, k, v = res
    H, dh, S, B = q.shape
    blk = _specs(H, dh, S, LANE_BLOCK)
    kernel = functools.partial(_bwd_kernel, scale=scale, dh=dh, S=S)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, dh, S, B), jnp.float32),
            jax.ShapeDtypeStruct((H, dh, S, B), jnp.float32),
            jax.ShapeDtypeStruct((H, dh, S, B), jnp.float32),
        ),
        grid=(B // LANE_BLOCK, H),
        in_specs=[blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, k, v, g)
    return dq, dk, dv


lane_attention.defvjp(_la_fwd, _la_bwd)


_BACKEND = "auto"


def set_backend(name: str):
    """'auto' (the lane kernel on single-chip TPU for small S, XLA einsums
    elsewhere), 'xla', or 'lanes'."""
    global _BACKEND
    assert name in ("auto", "xla", "lanes")
    _BACKEND = name


def use_lane_attention(S: int) -> bool:
    """Dispatch decision for field-axis MHSA at sequence length S.

    Explicit 'xla' and the MAX_S guard take precedence over interpret mode
    — a kernel-vs-XLA A/B on CPU must actually compare two paths, and an
    interpret run must not materialize the [S, S, 128] block MAX_S bounds."""
    if _BACKEND == "xla" or S > MAX_S:
        return False
    if _INTERPRET:
        return True
    if _BACKEND == "lanes":
        return True
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False


def lane_mhsa_packed(Q, K, V, scale, heads):
    """Attention over [B, S, E] with E = heads*dh packed along the last axis
    (same contract as ``attention_pallas.mhsa_attention_packed``).  Pads the
    batch to a lane-block multiple internally."""
    B, S, E = Q.shape
    dh = E // heads
    Bp = -(-B // LANE_BLOCK) * LANE_BLOCK
    pad = Bp - B

    def to_lanes(x):
        # [B, S, E] -> [E, S, B] -> [H, dh, S, B]; E index = h*dh + d matches
        # the heads-split reshape (B, S, H, dh) of the packed projections
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return jnp.transpose(x, (2, 1, 0)).reshape(
            heads, dh, S, Bp
        ).astype(jnp.float32)

    out = lane_attention(to_lanes(Q), to_lanes(K), to_lanes(V), float(scale))
    out = jnp.transpose(out.reshape(E, S, Bp), (2, 1, 0))
    return out[:B] if pad else out
