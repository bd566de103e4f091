"""Fused small-sequence attention kernel for the attention-pooled CIN.

The CIN-attention variants run MHSA over a few hundred feature maps with TINY
head dims (emb/heads ~ 5) — reference ``cin_attention.py:292-302``.  At
B=4096 the XLA lowering materializes [B, h, S, S] score/probability tensors in
HBM for the backward pass (~2 GB each; measured 37 ms fwd+bwd on v5e), and
jax's bundled TPU flash kernel is worse still (99 ms — its blocking assumes
LLM head dims, so dh=5 wastes 25x on every matmul AND pays full blocking
overhead).

MEASURED (v5e, B=4096, h=2, S=256, dh=5, xDeepFMAttention train step):
48.4 ms XLA (either einsum form — XLA materializes the head transposes inside
its batched matmuls) vs 42.8 ms for this kernel.  A packed-head [B, S, E]
variant that slices heads on VMEM values (killing the feed transposes, ~6 ms)
STALLS the Mosaic compiler — unaligned 5-lane value slices; do not revisit
without checking Mosaic first.  Numerically exact fp32 — tighter than the XLA
path's default single-pass-bf16 matmuls.  Design:

* operands are **dh-major** ``[G, dh, S]``: S rides the 128-lane axis (266 →
  384, 1.44x pad) instead of dh (5 → 128, **25.6x pad**).  The original
  [G, S, dh] layout made every HBM operand ~1.1 GB for 43.6 MB of payload —
  ~4.4 GB of traffic per forward — and that, not the in-kernel math, was the
  measured floor (in that layout a bf16-dots variant and an MXU-sum/
  folded-normalizer softmax variant were both NEUTRAL at ±3%; 2026-08-19).
  dh-major measured fwd 10.67 → 5.45 ms, fwd+bwd 22.57 → 14.47 ms on the
  microbench (scripts/bench_attn_kernel.py); on dh-major the MXU-sum softmax
  REGRESSES (see the note in ``_fwd_kernel``).  The flash-delta backward +
  program-order software pipelining took fwd+bwd to 12.47 ms (2026-08-21),
* one grid program handles a tile of Bt (batch*head) pairs; per pair the
  score/prob [S, S] lives only in registers/VMEM; every contraction is a
  single MXU dot_general over the leading dh axis,
* the backward recomputes the softmax (flash-style) so HBM traffic is just
  q/k/v/g and the input gradients at [G, dh, S].

All math is fp32 (preferred_element_type) — tighter than the XLA path's
default single-pass-bf16 matmuls.
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


_PRECISION = "fp32"


def set_precision(name: str):
    """'fp32' (default, exact) or 'bf16': cast dot OPERANDS to bf16 inside
    the kernel (accumulation stays fp32).  The per-pair dots dominate the
    attention-CIN step and fp32 MXU matmuls run as multi-pass bf16 emulation
    on v5e, so bf16 operands trade ~3 input mantissa bits for ~2x on the
    dominant cost.  Opt-in; quality must be A/B'd per model."""
    global _PRECISION
    assert name in ("fp32", "bf16")
    _PRECISION = name


def _dot(a, b, dims):
    if _PRECISION == "bf16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, z_ref, *, scale, Bt):
    # operands [Bt, dh, S]; scores/probs [S(query i), S(key j)].
    # Deferred-normalizer softmax: the scale folds into the exp pass and the
    # normalizing divide moves to the [dh, S] output; per-row stats (max m,
    # inverse normalizer inv_z) are written out for the backward.
    # NOTE: moving the row-sum to the MXU (e @ ones) REGRESSED (fwd 5.45 ->
    # 6.07 ms): a [S,S]@[S,1] dot pads its output to 128 lanes and costs a
    # full MXU tile pass.  Lane-axis reduction trees stay on the VPU.
    # NOTE: two single-stat variants (b = m*c + log2 z with exp2, then with
    # natural exp/log) REGRESSED the fwd to 7.4 / 8.5 ms (2026-08-20) — the
    # log runs on a lane-starved [S, 1] column and Mosaic's exp beats exp2;
    # saving m and inv_z separately keeps the fwd at its measured floor
    # (ablation: MXU dots alone 3.9 ms of the 5.45).
    # SOFTWARE-PIPELINED across pairs: Mosaic issues in program order, so
    # interleaving pair b's score dot (MXU) before pair b-1's softmax (VPU)
    # lets the units overlap — the unrolled loop alone does NOT reorder
    # (dots-only 3.9 ms + softmax measured ADDITIVE, 2026-08-20 ablation).
    def finish(b, s):
        m = jnp.max(s, axis=-1, keepdims=True)       # [S, 1]
        e = jnp.exp((s - m) * scale)
        inv_z = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o = _dot(v_ref[b], e, ((1,), (1,)))          # v e^T    [dh, S]
        o_ref[b] = o * inv_z.reshape(1, -1)          # normalize on [dh, S]
        m_ref[b : b + 1, :] = m.reshape(1, -1)
        z_ref[b : b + 1, :] = inv_z.reshape(1, -1)

    s_prev = None
    for b in range(Bt):
        s = _dot(q_ref[b], k_ref[b], ((0,), (0,)))   # q^T k    [S, S]
        if b > 0:
            finish(b - 1, s_prev)
        s_prev = s
    finish(Bt - 1, s_prev)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, m_ref, z_ref,
                dq_ref, dk_ref, dv_ref, *, scale, Bt):
    # Flash-style: e recomputed from the saved stats (no reduction trees),
    # and the softmax-jacobian row term delta_i = sum_j dp*p is recovered as
    # sum_d g*o — a [dh, S] sublane reduction instead of the full [S, S]
    # dp*e multiply + lane reduction.  p = e*inv_z is never materialized:
    # inv_z folds into the cheap [dh, S] g-scaling (dv) and the [S, 1]
    # column scale of ds.
    # Software-pipelined like the forward: pair b's two independent [S, S]
    # dots (s and dp) issue before pair b-1's VPU work + dependent dots.
    def finish(b, s, dp):
        g, o = g_ref[b], o_ref[b]                       # [dh, S]
        z_row = z_ref[b : b + 1, :]                     # [1, S] (inv_z)
        m_col = m_ref[b : b + 1, :].reshape(-1, 1)      # [S, 1]
        e = jnp.exp((s - m_col) * scale)
        gz = g * z_row                                  # [dh, S] pass
        dv_ref[b] = _dot(gz, e, ((1,), (0,)))           # gz e     [dh, S]
        delta = jnp.sum(g * o, axis=0, keepdims=True)   # [1, S]
        inv_z = z_row.reshape(-1, 1)                    # [S, 1]
        ds = ((dp - delta.reshape(-1, 1)) * (inv_z * scale)) * e
        dq_ref[b] = _dot(k_ref[b], ds, ((1,), (1,)))    # k ds^T   [dh, S]
        dk_ref[b] = _dot(q_ref[b], ds, ((1,), (0,)))    # q ds     [dh, S]

    prev = None
    for b in range(Bt):
        s = _dot(q_ref[b], k_ref[b], ((0,), (0,)))      # q^T k    [S, S]
        dp = _dot(g_ref[b], v_ref[b], ((0,), (0,)))     # g^T v    [S, S]
        if b > 0:
            finish(b - 1, *prev)
        prev = (s, dp)
    finish(Bt - 1, *prev)


def _pick_bt(G, S):
    # per-pair live [S, S] fp32 temporaries; keep the unrolled tile around
    # a few MB of VMEM.  Bt sits on the SUBLANE axis of the [Bt, S] stat
    # blocks, so it must be a multiple of 8 (Mosaic rule; entry points pad
    # G to a multiple of 8 — see _sa_padded)
    budget = max(1, (6 * 1024 * 1024) // (S * S * 4))
    bt = max(8, min(16, budget) // 8 * 8)
    while bt >= 8 and G % bt:
        bt -= 8
    if bt >= 8:
        return bt
    # no 8-aligned divisor: a whole-axis block (Bt == G) is also legal.
    # Only small G should land here — the packed entry points pad G to a
    # multiple of 8 (_sa_padded), so a large unaligned G means a direct
    # small_attention caller skipped the padding (the per-pair [S, S]
    # temporaries would then blow the VMEM limit at compile).
    return G


def _sa_padded(q, k, v, scale):
    """small_attention with the (row, head) axis padded to a multiple of 8.

    Zero padded rows are exact: their outputs are zeros (uniform softmax
    over zero scores applied to zero values), the output slice drops them,
    and the slice's VJP feeds the kernel zero cotangents for them."""
    G = q.shape[0]
    Gp = -(-G // 8) * 8
    if Gp != G:
        pad = ((0, Gp - G), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = small_attention(q, k, v, scale)
    return out[:G] if Gp != G else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def small_attention(q, k, v, scale):
    """softmax(q^T k * scale) applied to v for dh-major [G, dh, S] operands
    (S on lanes); returns [G, dh, S].  Scores never leave VMEM.

    Tiny-S only: the minimum legal pair tile (8 sublanes) keeps 8 live
    [S, S] fp32 score temporaries in VMEM, so S beyond ~440 exceeds the
    6 MB budget _pick_bt sizes tiles against — raise here instead of
    silently compiling an over-budget kernel (in-repo callers are S <= 64)."""
    S = q.shape[2]
    if 8 * S * S * 4 > 6 * 1024 * 1024:
        raise ValueError(
            f"small_attention supports tiny sequence lengths only: S={S} "
            "needs more VMEM than the 6 MB tile budget even at the minimum "
            "8-row pair tile (use the XLA attention path for long sequences)"
        )
    out, _ = _sa_fwd(q, k, v, scale)
    return out


def _sa_fwd(q, k, v, scale):
    G, dh, S = q.shape
    Bt = _pick_bt(G, S)
    sd = pl.BlockSpec((Bt, dh, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bt, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, scale=scale, Bt=Bt)
    out, m, z = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, dh, S), jnp.float32),
            jax.ShapeDtypeStruct((G, S), jnp.float32),
            jax.ShapeDtypeStruct((G, S), jnp.float32),
        ),
        grid=(G // Bt,),
        in_specs=[sd, sd, sd],
        out_specs=(sd, st, st),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, k, v)
    return out, (q, k, v, out, m, z)


def _sa_bwd(scale, res, g):
    q, k, v, out, m, z = res
    G, dh, S = q.shape
    Bt = _pick_bt(G, S)
    sd = pl.BlockSpec((Bt, dh, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bt, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, scale=scale, Bt=Bt)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, dh, S), jnp.float32),
            jax.ShapeDtypeStruct((G, dh, S), jnp.float32),
            jax.ShapeDtypeStruct((G, dh, S), jnp.float32),
        ),
        grid=(G // Bt,),
        in_specs=[sd, sd, sd, sd, sd, st, st],
        out_specs=(sd, sd, sd),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, k, v, g, out, m, z)
    return dq, dk, dv


small_attention.defvjp(_sa_fwd, _sa_bwd)


_MHSA_BACKEND = "auto"


def set_mhsa_backend(name: str):
    """'auto' (default: the fused kernel on single-chip TPU, XLA einsums
    elsewhere), 'xla', or 'pallas'."""
    global _MHSA_BACKEND
    assert name in ("auto", "xla", "pallas")
    _MHSA_BACKEND = name


def get_mhsa_backend():
    return _MHSA_BACKEND


def mhsa_attention_packed(Q, K, V, scale, heads, backend: str = "auto"):
    """Attention over [B, S, E] with E = heads*dh packed along the last axis
    (the q/k/v projections' natural output layout).  Dispatch per
    set_mhsa_backend."""
    B, S, E = Q.shape
    dh = E // heads
    be = _MHSA_BACKEND if backend == "auto" else backend
    if be == "auto":
        # interpret mode flips only the AUTO case: an explicit 'xla'
        # selection stays XLA so kernel-vs-XLA A/B tests compare two paths
        if _INTERPRET:
            be = "pallas"
        else:
            try:
                be = (
                    "pallas"
                    if jax.default_backend() == "tpu"
                    and len(jax.devices()) == 1
                    else "xla"
                )
            except Exception:
                be = "xla"
    if be == "pallas":
        # dh-major [G, dh, S] kernel operands: compact in HBM (S on lanes)
        perm = lambda x: (
            x.reshape(B, S, heads, dh)
            .transpose(0, 2, 3, 1)
            .reshape(B * heads, dh, S)
            .astype(jnp.float32)
        )
        out = _sa_padded(perm(Q), perm(K), perm(V), float(scale))
        return (
            out.reshape(B, heads, dh, S)
            .transpose(0, 3, 1, 2)
            .reshape(B, S, E)
        )
    Qr = Q.reshape(B, S, heads, dh)
    Kr = K.reshape(B, S, heads, dh)
    Vr = V.reshape(B, S, heads, dh)
    scores = jnp.einsum("bshd,bthd->bhst", Qr, Kr) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", probs, Vr).reshape(B, S, E)


def mhsa_attention_packed_t(Q, K, V, scale, heads, backend: str = "auto"):
    """Attention over TRANSPOSED packed-head operands [B, E, S] (E = heads*dh,
    S on lanes).  The head split is a free reshape here — [B, E, S] →
    [B*heads, dh, S] is exactly the kernel's dh-major contract, so unlike the
    batch-major entry point there are NO relayout transposes on either side."""
    B, E, S = Q.shape
    dh = E // heads
    be = _MHSA_BACKEND if backend == "auto" else backend
    if be == "auto":
        # interpret mode flips only the AUTO case: an explicit 'xla'
        # selection stays XLA so kernel-vs-XLA A/B tests compare two paths
        if _INTERPRET:
            be = "pallas"
        else:
            try:
                be = (
                    "pallas"
                    if jax.default_backend() == "tpu"
                    and len(jax.devices()) == 1
                    else "xla"
                )
            except Exception:
                be = "xla"
    if be == "pallas":
        perm = lambda x: x.reshape(B * heads, dh, S).astype(jnp.float32)
        out = _sa_padded(perm(Q), perm(K), perm(V), float(scale))
        return out.reshape(B, E, S)
    Qr = Q.reshape(B, heads, dh, S)
    Kr = K.reshape(B, heads, dh, S)
    Vr = V.reshape(B, heads, dh, S)
    scores = jnp.einsum("bhds,bhdt->bhst", Qr, Kr) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhdt->bhds", probs, Vr).reshape(B, E, S)
