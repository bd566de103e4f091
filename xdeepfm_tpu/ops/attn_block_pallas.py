"""Fully-fused attention BLOCK kernel for the attention-pooled CIN.

Round 2 left the MHSA kernel (ops/attention_pallas.py) measured near its
tiny-dh MXU floor, with ~2.5 ms of GLUE around it: the q/k/v/o projections,
residual add, LayerNorm and attention pooling each re-materialize the
[B, E, S] activation in HBM (reference chain: ``cin_attention.py:26-144``).
This kernel fuses the ENTIRE post-CIN block

    x -> [ MHSA(Wq,Wk,Wv,Wo) -> +residual -> LayerNorm ] * L -> tanh-MLP
    attention pooling -> pooled [B, E]

into one Pallas program per batch tile: x is read from HBM once, every
intermediate ([dh, S] heads, [S, S] scores, [E, S] layer outputs) lives in
VMEM/registers, and the only forward outputs are pooled [B, E] plus the
per-head softmax stats (max, inverse normalizer — the flash residuals) and,
for stacked layers, the inter-layer activations the backward needs.

The custom VJP recomputes each layer's attention from the saved stats
(flash-delta style, same math as ops/attention_pallas._bwd_kernel) and walks
the chain in reverse — pooling -> LN -> residual -> W_o -> attention ->
q/k/v projections — inside the same kernel.  Parameter gradients accumulate
across the sequential TPU grid into revisited output blocks.

Weight layout: per-(layer, head) projection slices are pre-split on the host
(wq/wk/wv [L*H, E, dh], wo [L*H, dh, E]) so the kernel never slices the
packed [E, E] matrices at un-aligned sublane offsets.  LN/pooling vectors
arrive as [.., E, 1] columns (E on sublanes, matching the [E, S] operands).

Mosaic rules honored (CLAUDE.md playbook): no implicit rank-3 broadcasts,
no transcendentals on [S, 1] columns, lane-axis reductions stay on the VPU,
fp32 everywhere (preferred_element_type).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


class BlockCfg(NamedTuple):
    layers: int
    heads: int
    scale: float
    use_residual: bool
    use_layer_norm: bool
    eps: float


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _layer_fwd(cfg, xl, l, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref, bet_ref,
               stats_out=None, saved_stats=None):
    """One MHSA+residual+LN layer on a single row's [E, S] activation.

    Returns (y, per-head (e, inv_z, o) list, r) — everything the backward
    needs.  ``stats_out``: callable(lh, m, inv_z) to persist stats (forward
    kernel); ``saved_stats``: callable(lh) -> (m_col, z_row) to reuse them
    (backward recompute — skips the max/sum reduction trees).
    """
    H = cfg.heads
    attn = None
    head_res = []
    for h in range(H):
        lh = l * H + h
        q = _dot(wq_ref[lh], xl, ((0,), (0,)))          # [dh, S]
        k = _dot(wk_ref[lh], xl, ((0,), (0,)))
        v = _dot(wv_ref[lh], xl, ((0,), (0,)))
        s = _dot(q, k, ((0,), (0,)))                    # [S, S]
        if saved_stats is None:
            m = jnp.max(s, axis=-1, keepdims=True)      # [S, 1]
            e = jnp.exp((s - m) * cfg.scale)
            inv_z = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            z_row = inv_z.reshape(1, -1)
            if stats_out is not None:
                stats_out(lh, m, inv_z)
        else:
            m_col, z_row = saved_stats(lh)
            e = jnp.exp((s - m_col) * cfg.scale)
            inv_z = z_row.reshape(-1, 1)
        o = _dot(v, e, ((1,), (1,))) * z_row            # [dh, S]
        head_res.append((q, k, v, e, inv_z, o))
        ao = _dot(wo_ref[lh], o, ((0,), (0,)))          # [E, S]
        attn = ao if attn is None else attn + ao
    r = attn + xl if cfg.use_residual else attn
    if cfg.use_layer_norm:
        E, S = r.shape
        mu = jnp.mean(r, axis=0, keepdims=True)         # [1, S]
        var = jnp.mean(r * r, axis=0, keepdims=True) - mu * mu
        rstd = jax.lax.rsqrt(var + cfg.eps)
        rh = (r - mu) * rstd                            # [E, S]
        gam = jnp.broadcast_to(gam_ref[l], (E, S))
        bet = jnp.broadcast_to(bet_ref[l], (E, S))
        y = gam * rh + bet
        ln_res = (rh, rstd)
    else:
        y = r
        ln_res = None
    return y, head_res, ln_res


def _pool_fwd(xl, w1_ref, b1_ref, w2_ref):
    """tanh-MLP attention pooling on [E, S] -> ([1, E], pieces)."""
    E, S = xl.shape
    b1 = jnp.broadcast_to(b1_ref[...], (E, S))
    h1 = jnp.tanh(_dot(w1_ref[...], xl, ((0,), (0,))) + b1)   # [E, S]
    sc = _dot(w2_ref[...], h1, ((0,), (0,)))                  # [1, S]
    mx = jnp.max(sc, axis=-1, keepdims=True)
    ew = jnp.exp(sc - mx)
    w = ew / jnp.sum(ew, axis=-1, keepdims=True)              # [1, S]
    pooled = _dot(w, xl, ((1,), (1,)))                        # [1, E]
    return pooled, (h1, w)


def _fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref, bet_ref,
                w1_ref, b1_ref, w2_ref,
                pooled_ref, m_ref, z_ref, ysave_ref, *, cfg, Bb):
    L = cfg.layers
    for b in range(Bb):
        xl = x_ref[b]

        def stats_out(lh, m, inv_z, b=b):
            m_ref[b, lh : lh + 1, :] = m.reshape(1, -1)
            z_ref[b, lh : lh + 1, :] = inv_z.reshape(1, -1)

        for l in range(L):
            y, _, _ = _layer_fwd(
                cfg, xl, l, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref,
                bet_ref, stats_out=stats_out,
            )
            if l < L - 1:
                ysave_ref[b, l] = y
            xl = y
        pooled, _ = _pool_fwd(xl, w1_ref, b1_ref, w2_ref)
        pooled_ref[b] = pooled  # [1, E] row of the [Bb, 1, E] block


def _bwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref, bet_ref,
                w1_ref, b1_ref, w2_ref, m_ref, z_ref, ysave_ref, g_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dgam_ref,
                dbet_ref, dw1_ref, db1_ref, dw2_ref, *, cfg, Bb):
    L, H = cfg.layers, cfg.heads
    LH = L * H
    E = x_ref.shape[1]
    dh = wq_ref.shape[2]

    # per-slice 2D accumulators (python lists; stacked writes at the end)
    dwq = [jnp.zeros((E, dh), jnp.float32) for _ in range(LH)]
    dwk = [jnp.zeros((E, dh), jnp.float32) for _ in range(LH)]
    dwv = [jnp.zeros((E, dh), jnp.float32) for _ in range(LH)]
    dwo = [jnp.zeros((dh, E), jnp.float32) for _ in range(LH)]
    S_ = x_ref.shape[2]
    dw1 = jnp.zeros((E, E), jnp.float32)
    # vector grads (dgamma/dbeta/db1/dw2) accumulate as FULL [E, S] mats and
    # reduce over S outside the kernel: Mosaic folds an add of any
    # lane-reduction (jnp.sum OR a dot it canonicalizes to one, e.g. against
    # a ones row / an N=1 rhs) into the reduction's accumulator, which must
    # be constant ("only constant accumulators supported")
    dw2_m = jnp.zeros((E, S_), jnp.float32)
    dgam_m = [jnp.zeros((E, S_), jnp.float32) for _ in range(L)]
    dbet_m = [jnp.zeros((E, S_), jnp.float32) for _ in range(L)]
    db1_m = jnp.zeros((E, S_), jnp.float32)

    for b in range(Bb):
        def saved_stats_for(b):
            def get(lh):
                m_col = m_ref[b, lh : lh + 1, :].reshape(-1, 1)   # [S, 1]
                z_row = z_ref[b, lh : lh + 1, :]                  # [1, S]
                return m_col, z_row
            return get

        xs = [x_ref[b]] + [ysave_ref[b, l] for l in range(L - 1)]

        # recompute the last layer to get the pooled-over activation
        y_fin, head_fin, ln_fin = _layer_fwd(
            cfg, xs[L - 1], L - 1, wq_ref, wk_ref, wv_ref, wo_ref,
            gam_ref, bet_ref, saved_stats=saved_stats_for(b),
        )

        # ---- pooling backward ----
        g = g_ref[b]                                              # [1, E]
        pooled, (h1, w) = _pool_fwd(y_fin, w1_ref, b1_ref, w2_ref)
        dw_row = _dot(g, y_fin, ((1,), (0,)))                     # [1, S]
        dy = _dot(g, w, ((0,), (0,)))                             # [E, S]
        dsc = (dw_row - jnp.sum(dw_row * w, axis=-1, keepdims=True)) * w
        dh1 = _dot(w2_ref[...], dsc, ((1,), (0,)))                # [E, S]
        dw2_m += h1 * dsc                               # -> sum_S outside
        dpre = dh1 * (1.0 - h1 * h1)
        dw1 += _dot(y_fin, dpre, ((1,), (1,)))                    # [E, E]
        db1_m += dpre                                   # -> sum_S outside
        dy = dy + _dot(w1_ref[...], dpre, ((1,), (0,)))           # [E, S]

        # ---- layer chain backward ----
        for l in range(L - 1, -1, -1):
            if l == L - 1:
                head_res, ln_res = head_fin, ln_fin
            else:
                _, head_res, ln_res = _layer_fwd(
                    cfg, xs[l], l, wq_ref, wk_ref, wv_ref, wo_ref,
                    gam_ref, bet_ref, saved_stats=saved_stats_for(b),
                )
            xl = xs[l]
            S = xl.shape[1]
            if cfg.use_layer_norm:
                rh, rstd = ln_res
                dgam_m[l] = dgam_m[l] + dy * rh
                dbet_m[l] = dbet_m[l] + dy
                gam = jnp.broadcast_to(gam_ref[l], (E, S))
                t = gam * dy
                dr = (
                    t
                    - jnp.mean(t, axis=0, keepdims=True)
                    - rh * jnp.mean(t * rh, axis=0, keepdims=True)
                ) * jnp.broadcast_to(rstd, (E, S))
            else:
                dr = dy
            dx = dr if cfg.use_residual else jnp.zeros_like(dy)
            for h in range(H):
                lh = l * H + h
                q, k, v, e, inv_z, o = head_res[h]
                doh = _dot(wo_ref[lh], dr, ((1,), (0,)))          # [dh, S]
                dwo[lh] = dwo[lh] + _dot(o, dr, ((1,), (1,)))     # [dh, E]
                z_row = inv_z.reshape(1, -1)
                gz = doh * z_row
                dv = _dot(gz, e, ((1,), (0,)))                    # [dh, S]
                delta = jnp.sum(doh * o, axis=0, keepdims=True)   # [1, S]
                dp = _dot(doh, v, ((0,), (0,)))                   # [S, S]
                ds = ((dp - delta.reshape(-1, 1)) * (inv_z * cfg.scale)) * e
                dq = _dot(k, ds, ((1,), (1,)))                    # [dh, S]
                dk = _dot(q, ds, ((1,), (0,)))                    # [dh, S]
                dx = dx + _dot(wq_ref[lh], dq, ((1,), (0,)))      # [E, S]
                dx = dx + _dot(wk_ref[lh], dk, ((1,), (0,)))
                dx = dx + _dot(wv_ref[lh], dv, ((1,), (0,)))
                dwq[lh] = dwq[lh] + _dot(xl, dq, ((1,), (1,)))    # [E, dh]
                dwk[lh] = dwk[lh] + _dot(xl, dk, ((1,), (1,)))
                dwv[lh] = dwv[lh] + _dot(xl, dv, ((1,), (1,)))
            dy = dx
        dx_ref[b] = dy

    # parameter-gradient accumulation across the (sequential) grid: program 0
    # initializes the revisited blocks, later programs add their tile's sums
    i = pl.program_id(0)

    def flush(ref, slices):
        @pl.when(i == 0)
        def _init():
            for j, v in enumerate(slices):
                ref[j] = v

        @pl.when(i > 0)
        def _acc():
            for j, v in enumerate(slices):
                ref[j] += v

    def flush2d(ref, v):
        @pl.when(i == 0)
        def _init():
            ref[...] = v

        @pl.when(i > 0)
        def _acc():
            ref[...] += v

    flush(dwq_ref, dwq)
    flush(dwk_ref, dwk)
    flush(dwv_ref, dwv)
    flush(dwo_ref, dwo)
    flush(dgam_ref, dgam_m)
    flush(dbet_ref, dbet_m)
    flush2d(dw1_ref, dw1)
    flush2d(db1_ref, db1_m)
    flush2d(dw2_ref, dw2_m)


def _pick_bb(B, S, bwd=False):
    """Batch-tile size: keep live [S, S] temporaries within a few MB of VMEM
    and the unrolled program body a manageable size for Mosaic."""
    cap = 4 if bwd else 8
    budget = max(1, (4 * 1024 * 1024) // (S * S * 4))
    bb = min(cap, budget)
    while B % bb:
        bb -= 1
    return bb


def _whole(arr):
    """BlockSpec pinning a (small) operand fully resident across programs."""
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def attn_block(cfg: BlockCfg, x, wq, wk, wv, wo, gamma, beta, w1, b1, w2):
    """Fused [MHSA + residual + LN]*L + attention pooling.

    x [B, E, S] (transposed lane-space CIN output); wq/wk/wv [L*H, E, dh];
    wo [L*H, dh, E]; gamma/beta [L, E, 1]; w1 [E, E]; b1/w2 [E, 1].
    Returns pooled [B, E].
    """
    out, _ = _ab_fwd(cfg, x, wq, wk, wv, wo, gamma, beta, w1, b1, w2)
    return out


def _ab_fwd(cfg, x, wq, wk, wv, wo, gamma, beta, w1, b1, w2):
    B, E, S = x.shape
    L, H = cfg.layers, cfg.heads
    LH = L * H
    Bb = _pick_bb(B, S)
    xd = pl.BlockSpec((Bb, E, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bb, LH, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    pd = pl.BlockSpec((Bb, 1, E), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    # inter-layer activations for the backward; a 1-element dummy when L == 1
    # so the never-written slot doesn't cost a [B, E, S] HBM stream
    ys = (B, L - 1, E, S) if L > 1 else (Bb, 1, 1, 1)
    yd = pl.BlockSpec((Bb,) + ys[1:] if L > 1 else ys,
                      (lambda i: (i, 0, 0, 0)) if L > 1
                      else (lambda i: (0, 0, 0, 0)),
                      memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, cfg=cfg, Bb=Bb)
    pooled, m, z, ysave = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
            jax.ShapeDtypeStruct((B, LH, S), jnp.float32),
            jax.ShapeDtypeStruct((B, LH, S), jnp.float32),
            jax.ShapeDtypeStruct(ys, jnp.float32),
        ),
        grid=(B // Bb,),
        in_specs=[xd] + [_whole(a) for a in
                         (wq, wk, wv, wo, gamma, beta, w1, b1, w2)],
        out_specs=(pd, st, st, yd),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(x, wq, wk, wv, wo, gamma, beta, w1, b1, w2)
    res = (x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave)
    return pooled.reshape(B, E), res


def _ab_bwd(cfg, res, g):
    x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave = res
    B, E, S = x.shape
    L, H = cfg.layers, cfg.heads
    LH = L * H
    Bb = _pick_bb(B, S, bwd=True)
    xd = pl.BlockSpec((Bb, E, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bb, LH, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    pd = pl.BlockSpec((Bb, 1, E), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    if L > 1:
        yd = pl.BlockSpec((Bb, L - 1, E, S), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    else:
        yd = pl.BlockSpec(ysave.shape, lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, cfg=cfg, Bb=Bb)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, E, S), jnp.float32),
            jax.ShapeDtypeStruct(wq.shape, jnp.float32),
            jax.ShapeDtypeStruct(wk.shape, jnp.float32),
            jax.ShapeDtypeStruct(wv.shape, jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((L, E, S), jnp.float32),
            jax.ShapeDtypeStruct((L, E, S), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((E, S), jnp.float32),
            jax.ShapeDtypeStruct((E, S), jnp.float32),
        ),
        grid=(B // Bb,),
        in_specs=(
            [xd]
            + [_whole(a) for a in
               (wq, wk, wv, wo, gamma, beta, w1, b1, w2)]
            + [st, st, yd, pd]
        ),
        out_specs=(
            xd, _whole(wq), _whole(wk), _whole(wv), _whole(wo),
            pl.BlockSpec((L, E, S), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E, S), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _whole(w1),
            pl.BlockSpec((E, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave,
      g.reshape(B, 1, E))
    (dx, dwq, dwk, dwv, dwo, dgam_m, dbet_m, dw1, db1_m, dw2_m) = outs
    # lane-axis reductions of the matrix-form vector grads happen here (XLA),
    # outside Mosaic's accumulator restriction; outputs match input shapes
    dgamma = jnp.sum(dgam_m, axis=-1, keepdims=True)          # [L, E, 1]
    dbeta = jnp.sum(dbet_m, axis=-1, keepdims=True)
    db1 = jnp.sum(db1_m, axis=-1, keepdims=True)              # [E, 1]
    dw2 = jnp.sum(dw2_m, axis=-1, keepdims=True)
    return (dx, dwq, dwk, dwv, dwo, dgamma, dbeta, dw1, db1, dw2)


attn_block.defvjp(_ab_fwd, _ab_bwd)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_BACKEND = "auto"


def set_backend(name: str):
    """'auto' (fused kernel on single-chip TPU, unfused elsewhere), 'xla'
    (never fuse), or 'pallas' (force — tests use this with interpret)."""
    global _BACKEND
    assert name in ("auto", "xla", "pallas")
    _BACKEND = name


def use_fused_block() -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND == "pallas" or _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False


def pack_projection(kernel, heads):
    """[E, E] packed-head projection kernel -> per-head [H, E, dh] slices."""
    E = kernel.shape[0]
    dh = kernel.shape[1] // heads
    return kernel.reshape(E, heads, dh).transpose(1, 0, 2)


def pack_out_projection(kernel, heads):
    """W_o [E, E] (rows = packed head outputs) -> per-head [H, dh, E]."""
    E = kernel.shape[1]
    dh = kernel.shape[0] // heads
    return kernel.reshape(heads, dh, E)
