"""Fully-fused attention BLOCK kernel for the attention-pooled CIN.

Round 2 left the MHSA kernel (ops/attention_pallas.py) measured near its
tiny-dh MXU floor, with ~2.5 ms of GLUE around it: the q/k/v/o projections,
residual add, LayerNorm and attention pooling each re-materialize the
[B, E, S] activation in HBM (reference chain: ``cin_attention.py:26-144``).
This kernel fuses the ENTIRE post-CIN block

    x -> [ MHSA(Wq,Wk,Wv,Wo) -> +residual -> LayerNorm ] * L -> tanh-MLP
    attention pooling -> pooled [B, E]

into one Pallas program per batch tile: x is read from HBM once and every
glue intermediate lives in VMEM.

LANE-BATCHED INTERIOR (v2 design): a first cut ran every projection/LN/pool
op per batch row; its ~11 tiny E=10-contraction MXU dots per row made the
fused forward SLOWER than the unfused path (11.9 vs 8.4 ms measured, each
small dot paying fixed MXU issue cost).  Here the tile's rows are
concatenated along the LANE axis into scratches (``xb [E, Bc*S]``), so
projections, W_o, LayerNorm and the pooling MLP run as per-CHUNK dots over
[*, CH_ROWS*S] slices (16 rows per dot), and only the [S, S] attention cores
— where the FLOPs are — remain per-(row, head), software-pipelined exactly
like attention_pallas (pair p+1's score dot issues before pair p's softmax).

The custom VJP saves per-head attention outputs (``osave``, lane layout),
the softmax stats (max + inverse normalizer) and inter-layer activations;
the backward recomputes scores flash-style and walks pool -> LN -> W_o ->
attention -> projections in reverse with the same chunk/pair split.
Parameter grads accumulate across the sequential TPU grid into revisited
output blocks; the VECTOR grads (dgamma/dbeta/db1/dw2) accumulate as
[E, CH_ROWS*S] mats reduced outside the kernel — Mosaic folds any add of a
lane-reduction (including N=1 dots it canonicalizes into reductions) into
the reduction's init accumulator, which must be constant ("only constant
accumulators supported").

Mosaic rules honored (CLAUDE.md playbook): no implicit rank-3 broadcasts,
no transcendentals on [S, 1] columns, lane-axis reductions stay on the VPU
and never feed accumulators, fp32 everywhere (preferred_element_type), all
lane slices at multiples of S (multiples of 128 at bench shapes).
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


def _tile_sizes(B, S):
    """(Bc rows per grid program, CH_ROWS rows per chunked glue op).

    Bc: largest divisor of B <= 16 — the unrolled program body scales with
    Bc*H attention pairs (a 128-row tile's ~250 KB MLIR got the remote
    compile helper OOM-killed); CH_ROWS <= 8 so several glue chunks
    interleave into each tile's pair stream (program-order MXU/VPU
    overlap)."""
    # ch == bc -> one chunk per tile: the glue runs after the tile's pair
    # stream.  Finer chunks interleaved INTO the stream measured WORSE
    # (Bc32/ch8: fwd 10.7 vs 8.0; the chunk_stage writes to the running
    # activation scratch serialize against the pair dots), as did larger
    # tiles — Bc16 serialized is the measured optimum (fwd 7.97 ms,
    # fwd+bwd 15.22 vs the unfused path's 8.44/15.36 at bench shapes).
    bc = min(16, B)
    while B % bc:
        bc -= 1
    ch = min(16, bc)
    while bc % ch:
        ch -= 1
    return bc, ch


def _seg_matrix(ch_rows, S):
    """[ch_rows*S, ch_rows] 0/1 matrix: lane i -> its row segment i // S.
    Turns the per-row weighted pooling sum into ONE MXU dot per chunk."""
    n = ch_rows * S
    seg = jax.lax.broadcasted_iota(jnp.int32, (n, ch_rows), 0) // S
    col = jax.lax.broadcasted_iota(jnp.int32, (n, ch_rows), 1)
    return (seg == col).astype(jnp.float32)


def _ln_fwd(cfg, l, r, gam_ref, bet_ref):
    """LayerNorm over E (sublanes) of an [E, chw] chunk; returns (y, rh,
    rstd).  Fast variance, matching nn.LayerNorm / LayerNormT."""
    E, chw = r.shape
    mu = jnp.mean(r, axis=0, keepdims=True)
    var = jnp.mean(r * r, axis=0, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + cfg.eps)
    rh = (r - mu) * jnp.broadcast_to(rstd, (E, chw))
    gam = jnp.broadcast_to(gam_ref[l], (E, chw))
    bet = jnp.broadcast_to(bet_ref[l], (E, chw))
    return gam * rh + bet, rh, rstd


def _glue_chunk_fwd(cfg, l, xc, osave_ref, wo_ref, gam_ref, bet_ref, sl):
    """W_o projection + residual + LN for one [E, chw] chunk (no pair dots:
    per-head o comes from the osave lane-layout block)."""
    H = cfg.heads
    r = None
    for h in range(H):
        ao = _dot(wo_ref[l * H + h], osave_ref[l * H + h, :, sl],
                  ((0,), (0,)))                                   # [E, chw]
        r = ao if r is None else r + ao
    if cfg.use_residual:
        r = r + xc
    if cfg.use_layer_norm:
        y, rh, rstd = _ln_fwd(cfg, l, r, gam_ref, bet_ref)
        return y, rh, rstd
    return r, None, None


def _attn_pairs_fwd(cfg, l, qb, kb, vb, osave_ref, m_ref, z_ref, Bc, S,
                    ch_rows, chunk_stage):
    """Pipelined per-(row, head) attention cores for one layer: the next
    pair's [S, S] score dot issues before the current pair's softmax so MXU
    and VPU overlap (Mosaic executes in program order).  ``chunk_stage(c)``
    (glue/pool work for chunk c) is emitted one pair into chunk c+1 — as
    soon as chunk c's pairs have all finished — so its VPU passes hide under
    the next chunk's score dots instead of serializing at the tile end."""
    H = cfg.heads
    ppc = ch_rows * H  # pairs per chunk

    def finish(b, h, s):
        lh = l * H + h
        m = jnp.max(s, axis=-1, keepdims=True)                    # [S, 1]
        e = jnp.exp((s - m) * cfg.scale)
        inv_z = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        z_row = inv_z.reshape(1, -1)
        o = _dot(vb[h, :, b * S : (b + 1) * S], e, ((1,), (1,))) * z_row
        osave_ref[lh, :, b * S : (b + 1) * S] = o
        m_ref[b, lh : lh + 1, :] = m.reshape(1, -1)
        z_ref[b, lh : lh + 1, :] = inv_z.reshape(1, -1)

    prev = None
    idx = 0
    for b in range(Bc):
        for h in range(H):
            q = qb[h, :, b * S : (b + 1) * S]
            k = kb[h, :, b * S : (b + 1) * S]
            s = _dot(q, k, ((0,), (0,)))                          # [S, S]
            if prev is not None:
                finish(*prev)
            prev = (b, h, s)
            c, within = divmod(idx, ppc)
            # chunk c-1's pairs are all finished once chunk c's second pair
            # issues (first pair when ppc == 1: finish(prev) above flushed it)
            if within == (1 if ppc > 1 else 0) and c >= 1:
                chunk_stage(c - 1)
            idx += 1
    finish(*prev)
    chunk_stage(Bc // ch_rows - 1)


def _fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref, bet_ref,
                w1_ref, b1_ref, w2_ref,
                pooled_ref, m_ref, z_ref, ysave_ref, osave_ref,
                xb, qb, kb, vb, wrow, *, cfg, Bc, ch_rows):
    L, H = cfg.layers, cfg.heads
    E = x_ref.shape[1]
    S = x_ref.shape[2]
    chw = ch_rows * S
    n_chunks = Bc // ch_rows

    # tile rows -> lane-concatenated scratch (VMEM-to-VMEM; no HBM cost)
    for b in range(Bc):
        xb[:, b * S : (b + 1) * S] = x_ref[b]

    segm = _seg_matrix(ch_rows, S)
    b1 = jnp.broadcast_to(b1_ref[...], (E, chw))

    def pool_chunk(c):
        # per-chunk MLP dots, per-row lane-segment softmax (VPU only), one
        # segment-sum dot
        sl = slice(c * chw, (c + 1) * chw)
        yc = xb[:, sl]
        h1 = jnp.tanh(_dot(w1_ref[...], yc, ((0,), (0,))) + b1)   # [E, chw]
        sc = _dot(w2_ref[...], h1, ((0,), (0,)))                  # [1, chw]
        for r in range(ch_rows):
            rs = slice(r * S, (r + 1) * S)
            row = sc[:, rs]                                       # [1, S]
            mx = jnp.max(row, axis=-1, keepdims=True)
            ew = jnp.exp(row - mx)
            wrow[:, rs] = ew / jnp.sum(ew, axis=-1, keepdims=True)
        wy = yc * jnp.broadcast_to(wrow[...], (E, chw))
        pooled_ref[0, :, c * ch_rows : (c + 1) * ch_rows] = _dot(
            wy, segm, ((1,), (0,))
        )                                                         # [E, rows]

    for l in range(L):
        for c in range(n_chunks):
            sl = slice(c * chw, (c + 1) * chw)
            xc = xb[:, sl]
            for h in range(H):
                lh = l * H + h
                qb[h, :, sl] = _dot(wq_ref[lh], xc, ((0,), (0,)))
                kb[h, :, sl] = _dot(wk_ref[lh], xc, ((0,), (0,)))
                vb[h, :, sl] = _dot(wv_ref[lh], xc, ((0,), (0,)))

        def chunk_stage(c, l=l):
            sl = slice(c * chw, (c + 1) * chw)
            y, _, _ = _glue_chunk_fwd(
                cfg, l, xb[:, sl], osave_ref, wo_ref, gam_ref, bet_ref, sl
            )
            if l < L - 1:
                ysave_ref[l, :, sl] = y
            xb[:, sl] = y  # running activation
            if l == L - 1:
                pool_chunk(c)

        _attn_pairs_fwd(
            cfg, l, qb, kb, vb, osave_ref, m_ref, z_ref, Bc, S, ch_rows,
            chunk_stage,
        )


def _bwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, gam_ref, bet_ref,
                w1_ref, b1_ref, w2_ref, m_ref, z_ref, ysave_ref, osave_ref,
                gt_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dgam_ref,
                dbet_ref, dw1_ref, db1_ref, dw2_ref,
                xb, qb, kb, vb, dqb, dkb, dvb, dya, dyb_, drb, wrow, dscrow,
                gb, *, cfg, Bc, ch_rows):
    L, H = cfg.layers, cfg.heads
    LH = L * H
    E = x_ref.shape[1]
    S = x_ref.shape[2]
    chw = ch_rows * S
    n_chunks = Bc // ch_rows
    i = pl.program_id(0)

    # mat-accumulated vector grads live in output refs; zero them first
    @pl.when(i == 0)
    def _init_vec():
        dgam_ref[...] = jnp.zeros_like(dgam_ref)
        dbet_ref[...] = jnp.zeros_like(dbet_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    for b in range(Bc):
        xb[:, b * S : (b + 1) * S] = x_ref[b]

    def src(l):
        """The layer's input in lane layout: x for layer 0, else the saved
        inter-layer activation."""
        if l == 0:
            return xb
        return ysave_ref[l - 1]

    def stats(b, lh):
        m_col = m_ref[b, lh : lh + 1, :].reshape(-1, 1)           # [S, 1]
        z_row = z_ref[b, lh : lh + 1, :]                          # [1, S]
        return m_col, z_row

    # tile-local weight-grad accumulators (dot results add fine)
    dwq = [jnp.zeros((E, wq_ref.shape[2]), jnp.float32) for _ in range(LH)]
    dwk = [jnp.zeros((E, wq_ref.shape[2]), jnp.float32) for _ in range(LH)]
    dwv = [jnp.zeros((E, wq_ref.shape[2]), jnp.float32) for _ in range(LH)]
    dwo = [jnp.zeros((wq_ref.shape[2], E), jnp.float32) for _ in range(LH)]
    dw1 = jnp.zeros((E, E), jnp.float32)

    # ---- pooling backward (recomputing the last layer's output chunks) ----
    lf = L - 1
    b1 = jnp.broadcast_to(b1_ref[...], (E, chw))
    for c in range(n_chunks):
        sl = slice(c * chw, (c + 1) * chw)
        yc, _, _ = _glue_chunk_fwd(
            cfg, lf, src(lf)[:, sl], osave_ref, wo_ref, gam_ref, bet_ref, sl
        )
        h1 = jnp.tanh(_dot(w1_ref[...], yc, ((0,), (0,))) + b1)
        sc = _dot(w2_ref[...], h1, ((0,), (0,)))                  # [1, chw]
        for r in range(ch_rows):
            rs = slice(r * S, (r + 1) * S)
            row = sc[:, rs]
            mx = jnp.max(row, axis=-1, keepdims=True)
            ew = jnp.exp(row - mx)
            wrow[:, rs] = ew / jnp.sum(ew, axis=-1, keepdims=True)
            g_col = gt_ref[0, :, c * ch_rows + r : c * ch_rows + r + 1]
            gb[:, rs] = jnp.broadcast_to(g_col, (E, S))
        # dL/dw[s] = sum_e g[e] y[e, s] — sublane reduction (standalone)
        dwvec = jnp.sum(yc * gb[...], axis=0, keepdims=True)      # [1, chw]
        for r in range(ch_rows):
            rs = slice(r * S, (r + 1) * S)
            dw_r = dwvec[:, rs]
            w_r = wrow[:, rs]
            dscrow[:, rs] = (
                dw_r - jnp.sum(dw_r * w_r, axis=-1, keepdims=True)
            ) * w_r
        dsc = dscrow[...]
        dh1 = _dot(w2_ref[...], dsc, ((1,), (0,)))                # [E, chw]
        dw2_ref[...] += h1 * jnp.broadcast_to(dsc, (E, chw))
        dpre = dh1 * (1.0 - h1 * h1)
        dw1 += _dot(yc, dpre, ((1,), (1,)))                       # [E, E]
        db1_ref[...] += dpre
        dya[:, sl] = gb[...] * jnp.broadcast_to(wrow[...], (E, chw)) + _dot(
            w1_ref[...], dpre, ((1,), (0,))
        )

    # ---- layer chain backward ----
    dy_s, dx_s = dya, dyb_
    for l in range(L - 1, -1, -1):
        xl = src(l)

        def prep(c, l=l, xl=xl):
            # projection recompute + LN backward for chunk c (fills drb)
            sl = slice(c * chw, (c + 1) * chw)
            xc = xl[:, sl]
            for h in range(H):
                lh = l * H + h
                qb[h, :, sl] = _dot(wq_ref[lh], xc, ((0,), (0,)))
                kb[h, :, sl] = _dot(wk_ref[lh], xc, ((0,), (0,)))
                vb[h, :, sl] = _dot(wv_ref[lh], xc, ((0,), (0,)))
            dyc = dy_s[:, sl]
            if cfg.use_layer_norm:
                # LN backward needs r recomputed (pre-LN, post-residual)
                r = None
                for h in range(H):
                    lh = l * H + h
                    ao = _dot(wo_ref[lh], osave_ref[lh, :, sl], ((0,), (0,)))
                    r = ao if r is None else r + ao
                if cfg.use_residual:
                    r = r + xc
                mu = jnp.mean(r, axis=0, keepdims=True)
                var = jnp.mean(r * r, axis=0, keepdims=True) - mu * mu
                rstd = jax.lax.rsqrt(var + cfg.eps)
                rh = (r - mu) * jnp.broadcast_to(rstd, (E, chw))
                dgam_ref[l] += dyc * rh
                dbet_ref[l] += dyc
                t = jnp.broadcast_to(gam_ref[l], (E, chw)) * dyc
                drc = (
                    t
                    - jnp.mean(t, axis=0, keepdims=True)
                    - rh * jnp.mean(t * rh, axis=0, keepdims=True)
                ) * jnp.broadcast_to(rstd, (E, chw))
            else:
                drc = dyc
            drb[:, sl] = drc

        # per-pair flash-delta attention backward, pipelined: pair p+1's
        # two independent [S, S] dots (s, dp) issue before pair p's VPU work
        def pair_head(b, h):
            lh = l * H + h
            q = qb[h, :, b * S : (b + 1) * S]
            k = kb[h, :, b * S : (b + 1) * S]
            s = _dot(q, k, ((0,), (0,)))                          # [S, S]
            doh = _dot(wo_ref[lh], drb[:, b * S : (b + 1) * S], ((1,), (0,)))
            dp = _dot(doh, vb[h, :, b * S : (b + 1) * S], ((0,), (0,)))
            return q, k, s, doh, dp

        def pair_finish(b, h, q, k, s, doh, dp):
            lh = l * H + h
            m_col, z_row = stats(b, lh)
            e = jnp.exp((s - m_col) * cfg.scale)
            o = osave_ref[lh, :, b * S : (b + 1) * S]
            gz = doh * z_row
            dvb[h, :, b * S : (b + 1) * S] = _dot(gz, e, ((1,), (0,)))
            delta = jnp.sum(doh * o, axis=0, keepdims=True)       # [1, S]
            inv_z = z_row.reshape(-1, 1)
            ds = ((dp - delta.reshape(-1, 1)) * (inv_z * cfg.scale)) * e
            dqb[h, :, b * S : (b + 1) * S] = _dot(k, ds, ((1,), (1,)))
            dkb[h, :, b * S : (b + 1) * S] = _dot(q, ds, ((1,), (0,)))

        def post(c, l=l, xl=xl, dx_s=dx_s):
            # dW and dx for chunk c, chunk-batched dots
            sl = slice(c * chw, (c + 1) * chw)
            xc = xl[:, sl]
            drc = drb[:, sl]
            dxc = drc if cfg.use_residual else jnp.zeros_like(drc)
            for h in range(H):
                lh = l * H + h
                dq_c = dqb[h, :, sl]
                dk_c = dkb[h, :, sl]
                dv_c = dvb[h, :, sl]
                dwq[lh] += _dot(xc, dq_c, ((1,), (1,)))           # [E, dh]
                dwk[lh] += _dot(xc, dk_c, ((1,), (1,)))
                dwv[lh] += _dot(xc, dv_c, ((1,), (1,)))
                dwo[lh] += _dot(osave_ref[lh, :, sl], drc, ((1,), (1,)))
                dxc = dxc + _dot(wq_ref[lh], dq_c, ((1,), (0,)))
                dxc = dxc + _dot(wk_ref[lh], dk_c, ((1,), (0,)))
                dxc = dxc + _dot(wv_ref[lh], dv_c, ((1,), (0,)))
            dx_s[:, sl] = dxc

        # interleaved pipelined sweep: chunk c+1's prep and chunk c-1's
        # post are emitted one pair into chunk c, hiding their VPU/grad
        # work under the pair stream's score/dp dots
        prep(0)
        ppc = ch_rows * H
        prev = None
        idx = 0
        for b in range(Bc):
            for h in range(H):
                cur = (b, h) + pair_head(b, h)
                if prev is not None:
                    pair_finish(*prev)
                prev = cur
                c, within = divmod(idx, ppc)
                if within == (1 if ppc > 1 else 0):
                    if c + 1 < n_chunks:
                        prep(c + 1)
                    if c >= 1:
                        post(c - 1)
                idx += 1
        pair_finish(*prev)
        post(n_chunks - 1)
        dy_s, dx_s = dx_s, dy_s  # rotate: this layer's dx is the next dy

    for b in range(Bc):
        dx_ref[b] = dy_s[:, b * S : (b + 1) * S]

    # flush tile-local weight grads into the revisited accumulator blocks
    def flush(ref, slices):
        @pl.when(i == 0)
        def _init():
            for j, v in enumerate(slices):
                ref[j] = v

        @pl.when(i > 0)
        def _acc():
            for j, v in enumerate(slices):
                ref[j] += v

    flush(dwq_ref, dwq)
    flush(dwk_ref, dwk)
    flush(dwv_ref, dwv)
    flush(dwo_ref, dwo)

    @pl.when(i == 0)
    def _initw1():
        dw1_ref[...] = dw1

    @pl.when(i > 0)
    def _accw1():
        dw1_ref[...] += dw1


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


def _specs(B, E, S, L, LH, Bc, dh):
    n = Bc * S
    xd = pl.BlockSpec((Bc, E, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    st = pl.BlockSpec((Bc, LH, S), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    # pooled/g ride as [tile, E, Bc] so the block's last two dims equal
    # the overall array dims regardless of Bc (sublane/lane rule)
    pd = pl.BlockSpec((1, E, Bc), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    od = pl.BlockSpec((LH, dh, n), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    if L > 1:
        ysh = (L - 1, E, B * S)
        yd = pl.BlockSpec((L - 1, E, n), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    else:
        ysh = (1, 1, 1)
        yd = pl.BlockSpec(ysh, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return xd, st, pd, od, yd, ysh


def _ab_fwd(cfg, x, wq, wk, wv, wo, gamma, beta, w1, b1, w2):
    B, E, S = x.shape
    L, H = cfg.layers, cfg.heads
    LH = L * H
    dh = wq.shape[2]
    Bc, ch_rows = _tile_sizes(B, S)
    n = Bc * S
    xd, st, pd, od, yd, ysh = _specs(B, E, S, L, LH, Bc, dh)
    kernel = functools.partial(_fwd_kernel, cfg=cfg, Bc=Bc, ch_rows=ch_rows)
    pooled_t, m, z, ysave, osave = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B // Bc, E, Bc), jnp.float32),
            jax.ShapeDtypeStruct((B, LH, S), jnp.float32),
            jax.ShapeDtypeStruct((B, LH, S), jnp.float32),
            jax.ShapeDtypeStruct(ysh, jnp.float32),
            jax.ShapeDtypeStruct((LH, dh, B * S), jnp.float32),
        ),
        grid=(B // Bc,),
        in_specs=[xd] + [_whole(a) for a in
                         (wq, wk, wv, wo, gamma, beta, w1, b1, w2)],
        out_specs=(pd, st, st, yd, od),
        scratch_shapes=[
            pltpu.VMEM((E, n), jnp.float32),        # xb
            pltpu.VMEM((H, dh, n), jnp.float32),    # qb
            pltpu.VMEM((H, dh, n), jnp.float32),    # kb
            pltpu.VMEM((H, dh, n), jnp.float32),    # vb
            pltpu.VMEM((1, ch_rows * S), jnp.float32),  # wrow
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(x, wq, wk, wv, wo, gamma, beta, w1, b1, w2)
    res = (x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave, osave)
    pooled = jnp.transpose(pooled_t, (0, 2, 1)).reshape(B, E)
    return pooled, res


def _ab_bwd(cfg, res, g):
    x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave, osave = res
    B, E, S = x.shape
    L, H = cfg.layers, cfg.heads
    LH = L * H
    dh = wq.shape[2]
    Bc, ch_rows = _tile_sizes(B, S)
    n = Bc * S
    chw = ch_rows * S
    xd, st, pd, od, yd, _ = _specs(B, E, S, L, LH, Bc, dh)
    kernel = functools.partial(_bwd_kernel, cfg=cfg, Bc=Bc, ch_rows=ch_rows)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, E, S), jnp.float32),
            jax.ShapeDtypeStruct(wq.shape, jnp.float32),
            jax.ShapeDtypeStruct(wk.shape, jnp.float32),
            jax.ShapeDtypeStruct(wv.shape, jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((L, E, chw), jnp.float32),
            jax.ShapeDtypeStruct((L, E, chw), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((E, chw), jnp.float32),
            jax.ShapeDtypeStruct((E, chw), jnp.float32),
        ),
        grid=(B // Bc,),
        in_specs=(
            [xd]
            + [_whole(a) for a in
               (wq, wk, wv, wo, gamma, beta, w1, b1, w2)]
            + [st, st, yd, od, pd]
        ),
        out_specs=(
            xd, _whole(wq), _whole(wk), _whole(wv), _whole(wo),
            pl.BlockSpec((L, E, chw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, E, chw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _whole(w1),
            pl.BlockSpec((E, chw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, chw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((E, n), jnp.float32),        # xb
            pltpu.VMEM((H, dh, n), jnp.float32),    # qb
            pltpu.VMEM((H, dh, n), jnp.float32),    # kb
            pltpu.VMEM((H, dh, n), jnp.float32),    # vb
            pltpu.VMEM((H, dh, n), jnp.float32),    # dqb
            pltpu.VMEM((H, dh, n), jnp.float32),    # dkb
            pltpu.VMEM((H, dh, n), jnp.float32),    # dvb
            pltpu.VMEM((E, n), jnp.float32),        # dya
            pltpu.VMEM((E, n), jnp.float32),        # dyb_
            pltpu.VMEM((E, n), jnp.float32),        # drb
            pltpu.VMEM((1, chw), jnp.float32),      # wrow
            pltpu.VMEM((1, chw), jnp.float32),      # dscrow
            pltpu.VMEM((E, chw), jnp.float32),      # gb
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(x, wq, wk, wv, wo, gamma, beta, w1, b1, w2, m, z, ysave, osave,
      jnp.transpose(g.reshape(B // Bc, Bc, E), (0, 2, 1)))
    (dx, dwq, dwk, dwv, dwo, dgam_m, dbet_m, dw1, db1_m, dw2_m) = outs
    # lane reductions of the matrix-form vector grads happen here (XLA),
    # outside Mosaic's accumulator restriction
    dgamma = jnp.sum(dgam_m, axis=-1, keepdims=True)              # [L, E, 1]
    dbeta = jnp.sum(dbet_m, axis=-1, keepdims=True)
    db1 = jnp.sum(db1_m, axis=-1, keepdims=True)                  # [E, 1]
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


def use_fused_block(seq_len: int | None = None) -> bool:
    """Whether to dispatch the fused block kernel.

    ``seq_len`` (the CIN feature-map count S) gates alignment: the kernel's
    in-VMEM lane slices land at multiples of S, and Mosaic requires lane
    offsets aligned to the 128-lane register width — S % 128 != 0 would
    fail at compile on real TPU (interpret mode does not check).  Callers
    that know S must pass it; the unfused XLA composition is the fallback.
    """
    if _BACKEND == "xla":
        return False
    if seq_len is not None and seq_len % 128 != 0 and not _INTERPRET:
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
