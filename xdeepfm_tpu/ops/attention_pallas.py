"""Fused small-sequence attention kernel for the attention-pooled CIN.

The CIN-attention variants run MHSA over <=~350 feature maps with TINY head
dims (emb/heads ~ 5) — ``cin_attention.py:292-302``.  At B=4096 the XLA
lowering materializes [B, h, S, S] scores in HBM (~2 GB per tensor) and wastes
the MXU on K=dh=5 contractions.  This kernel:

* computes scores on the VPU as dh broadcast FMAs (no lane-padded matmul),
* keeps scores/probabilities entirely in VMEM (never written to HBM),
* recomputes the softmax in the backward kernel (flash-style) so the only
  HBM traffic is q/k/v/g/out at [G, S, dh].

Layout: q [G, S, dh] and kT/vT [G, dh, S] with G = B*heads flattened outside
(the transposes are tiny relative to the scores they replace).
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


def _scores(q, kt, scale, dh):
    # q: [S, dh]; kt: [dh, S] -> s: [S, S] via dh broadcast FMAs (VPU)
    s = q[:, 0:1] * kt[0:1, :]
    for d in range(1, dh):
        s = s + q[:, d : d + 1] * kt[d : d + 1, :]
    return s * scale


def _softmax(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, kt_ref, vt_ref, o_ref, *, scale, dh, Bt):
    for b in range(Bt):
        p = _softmax(_scores(q_ref[b], kt_ref[b], scale, dh))  # [S, S]
        # out = p @ v: contract S (K=S, MXU-friendly); vt [dh, S] -> v [S, dh]
        o_ref[b] = jax.lax.dot_general(
            p, vt_ref[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _bwd_kernel(q_ref, kt_ref, vt_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale, dh, Bt):
    for b in range(Bt):
        q = q_ref[b]  # [S, dh]
        kt = kt_ref[b]  # [dh, S]
        vt = vt_ref[b]
        g = g_ref[b]  # [S, dh]
        p = _softmax(_scores(q, kt, scale, dh))  # recompute, VMEM-only
        # dv = p^T g  (K=S on MXU)
        dv_ref[b] = jax.lax.dot_general(
            p, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = g v^T via dh broadcast FMAs
        dp = g[:, 0:1] * vt[0:1, :]
        for d in range(1, dh):
            dp = dp + g[:, d : d + 1] * vt[d : d + 1, :]
        ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p * scale
        # dq = ds @ k   (k = kt^T; contract S: K=S on MXU)
        dq_ref[b] = jax.lax.dot_general(
            ds, kt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dk = ds^T @ q (contract S)
        dk_ref[b] = jax.lax.dot_general(
            ds, q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pick_bt(G, S):
    # per-pair VMEM ~ a few [S, S] fp32 buffers; keep the block modest
    budget = max(1, (2 * 1024 * 1024) // (S * S * 4))
    bt = min(8, budget)
    while G % bt:
        bt -= 1
    return bt


def _specs(G, S, dh, Bt):
    sd = pl.BlockSpec((Bt, S, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bt, dh, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return sd, st


@jax.custom_vjp
def small_attention(q, k, v, scale):
    """softmax(q k^T * scale) v for [G, S, dh]; scores never leave VMEM."""
    out, _ = _sa_fwd(q, k, v, scale)
    return out


def _run_fwd(q, kt, vt, scale):
    G, S, dh = q.shape
    Bt = _pick_bt(G, S)
    sd, st = _specs(G, S, dh, Bt)
    kernel = functools.partial(_fwd_kernel, scale=scale, dh=dh, Bt=Bt)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, S, dh), jnp.float32),
        grid=(G // Bt,),
        in_specs=[sd, st, st],
        out_specs=sd,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, kt, vt)


def _sa_fwd(q, k, v, scale):
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _run_fwd(q, kt, vt, scale)
    return out, (q, kt, vt, scale)


def _sa_bwd(res, g):
    q, kt, vt, scale = res
    G, S, dh = q.shape
    Bt = _pick_bt(G, S)
    sd, st = _specs(G, S, dh, Bt)
    kernel = functools.partial(_bwd_kernel, scale=scale, dh=dh, Bt=Bt)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, S, dh), jnp.float32),
            jax.ShapeDtypeStruct((G, S, dh), jnp.float32),
            jax.ShapeDtypeStruct((G, S, dh), jnp.float32),
        ),
        grid=(G // Bt,),
        in_specs=[sd, st, st, sd],
        out_specs=(sd, sd, sd),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, kt, vt, g)
    return dq, dk, dv, None


small_attention.defvjp(_sa_fwd, _sa_bwd)


_MHSA_BACKEND = "xla"


def set_mhsa_backend(name: str):
    """'xla' (default) or 'pallas'.  The fused kernel is numerically verified
    (tests) but EXPERIMENTAL on real hardware: v1 (MXU scores + saved probs)
    measured slower than XLA at dh=5, and v2's compile stalled the remote
    compiler — revisit before enabling by default."""
    global _MHSA_BACKEND
    assert name in ("xla", "pallas")
    _MHSA_BACKEND = name


def mhsa_attention(Q, K, V, scale, backend: str = "auto"):
    """[B, h, S, dh] attention dispatch (see set_mhsa_backend)."""
    B, h, S, dh = Q.shape
    if backend == "auto":
        be = _MHSA_BACKEND
        try:
            if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
                be = "xla"
        except Exception:
            be = "xla"
    else:
        be = backend
    if be == "pallas" or _INTERPRET:
        out = small_attention(
            Q.reshape(B * h, S, dh).astype(jnp.float32),
            K.reshape(B * h, S, dh).astype(jnp.float32),
            V.reshape(B * h, S, dh).astype(jnp.float32),
            float(scale),
        )
        return out.reshape(B, h, S, dh)
    scores = jnp.einsum("bhsk,bhtk->bhst", Q, K) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtk->bhsk", probs, V)
