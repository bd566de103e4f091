"""Fused softmax-cross-entropy kernel for vocab-sized SFG decoder heads.

The SFG decoder (reference ``deepctr/xdeepfm_pro/sfg_decoder.py:95-157,
240-311``) reconstructs every sparse feature with a vocab-sized softmax head
and takes per-row cross-entropy against the input ids.  At Criteo bench
shapes (26 heads x vocab 10k, B=4096, hidden 64) the XLA lowering
materializes ~4.3 GB of fp32 logits in HBM per step and re-reads them for
logsumexp, the target gather, the softmax backward, and both weight/input
gradient matmuls — ~20+ GB of HBM traffic for ~0.4 TFLOP of matmul, i.e. the
heads are bandwidth-bound, which is why the remat'd variant (recompute
logits in the backward) measured WORSE: the recomputed logits still round-trip
HBM, plus an extra matmul pass (BASELINE.md, 2026-08-19).

This kernel never writes logits at all:

* forward: grid (batch tiles, vocab blocks), vocab minor.  Each step computes
  one [Bt, Vb] logit block on the MXU in VMEM and folds it into a running
  online-logsumexp (max + sumexp accumulators in VMEM scratch) plus the
  picked-target logit; only the per-row loss ``logsumexp(z) - z[target]`` and
  the ``logz`` residual (both [B, 1]) reach HBM.
* backward: grid (vocab blocks, batch tiles) — vocab MAJOR, so the dW/db
  column blocks accumulate across the inner batch loop and stream out once,
  while dh ([B, K], ~1 MB) stays VMEM-resident for the whole kernel.  The
  logit block is recomputed (flash-style), ``P - onehot`` is formed in
  registers, and the three gradient contractions (dh, dW, db) run per block.

HBM traffic per head drops from ~800 MB to h + W read twice + gradients
(~6 MB at bench shapes).  Vocab blocking means there is NO vocab-size limit:
the same kernel serves the 1M+-row production vocabs for which the remat path
existed (materialized logits would be >400 GB there).  The BATCH*HIDDEN
product is bounded, though: the backward holds the whole fp32 dh [Bp, K]
accumulator in VMEM (constant-index BlockSpec), so 4*Bp*K must stay well
under the 100 MB vmem_limit — ``fits_vmem(B, K)`` checks this and callers
(``pro/sfg.py ce_rows``) fall back to the remat path when it fails.

Dots default to bf16 operands with fp32 accumulation — identical to what the
XLA path's default-precision fp32 matmuls do on TPU — with a knob to force
full fp32 emulation (``set_precision('fp32')``).
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


_PRECISION = "bf16"


def set_precision(name: str):
    """'bf16' (default: bf16 dot operands, fp32 accumulation — matches the
    XLA path's default matmul precision) or 'fp32' (exact, multi-pass)."""
    global _PRECISION
    assert name in ("fp32", "bf16")
    _PRECISION = name


_NEG = -1e30  # pad-column bias: exp underflows to 0, never the row max
# pipeline-priming sentinel: processing a block of _DUMMY against running
# stats initialized to _NEG is an exact no-op (max(_NEG, _DUMMY) == _NEG,
# exp(_DUMMY - _NEG) == exp(-3e38) == 0), so the software pipeline's first
# step can process the scratch UNCONDITIONALLY — pl.when-predicated bodies
# were measured to defeat MXU/VPU overlap (2026-08-20)
_DUMMY = -3.0e38

_BT = 512   # batch-tile rows
_VB = 1024  # vocab-block columns; round-3 sweep at bench shapes:
            # vb 512 -> 11.84 ms fwd+bwd, 1024 -> 9.94, 2048 -> 10.26
            # (bt 256/1024 at vb 1024 both regress; fewer grid steps halve
            # the per-block online-logsumexp/pipeline overhead until the
            # [Bt, Vb] block's VMEM footprint starts crowding the scratches)

_STACK_HEADS = True


def set_stack_heads(flag: bool):
    """Stacked-heads decoder path: one kernel launch for all same-shape
    heads.  DEFAULT ON since the VB=1024 retune — at VB=512 it was
    step-negative (the per-step W stack/pad copies outweighed the saved
    dispatches, 2026-08-20), but with the faster kernel the per-head
    dispatch/pipeline-drain overhead dominates instead: full Pro step
    17.13 -> 16.41 ms measured 2026-08-21."""
    global _STACK_HEADS
    _STACK_HEADS = bool(flag)


def stack_heads_enabled() -> bool:
    return _STACK_HEADS


def set_block_sizes(bt: int, vb: int):
    """Tile knobs (bench sweeps); vb must be a multiple of 128, bt of 8.

    Read at TRACE time: call before the first jit of the consuming step —
    values set after a jit cache fill do not retrigger compilation."""
    global _BT, _VB
    assert bt % 8 == 0 and bt > 0, f"bt must be a positive multiple of 8, got {bt}"
    assert vb % 128 == 0 and vb > 0, f"vb must be a positive multiple of 128, got {vb}"
    _BT, _VB = bt, vb


# the backward keeps the full dh [Bp, K] accumulator VMEM-resident (see
# module docstring); leave headroom under the 100 MB vmem_limit for the
# W/dW column blocks and the logit block temporaries.
_DH_VMEM_BUDGET = 48 * 1024 * 1024


def fits_vmem(B: int, K: int) -> bool:
    """True if the backward's VMEM-resident dh accumulator (fp32 [Bp, K])
    fits the budget.  Callers should fall back to a remat'd XLA path when
    this is False — at bench shapes (B=4096, K=64) dh is ~1 MB, but very
    large batch*hidden products would fail Mosaic compilation otherwise."""
    Bp = _ceil_to(B, min(_BT, _ceil_to(B, 8)))
    return 4 * Bp * K <= _DH_VMEM_BUDGET


def _dot(a, b, dims):
    if _PRECISION == "bf16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(nv_ref, h_ref, w_ref, b_ref, t_ref, ll_ref, logz_ref,
                m_ref, s_ref, p_ref, sS_ref, *, Bt, Vb):
    # SOFTWARE-PIPELINED: each grid step issues the MXU dot for vocab block
    # j, then runs the VPU online-logsumexp update on block j-1 (kept in the
    # sS scratch).  The two are data-independent, so Mosaic's scheduler can
    # overlap the dot with the previous block's softmax passes — without
    # this the grid steps serialize MXU and VPU work (the kernel is
    # VPU-bound: the dot is ~0.3 us/block vs ~1.5 us of softmax passes).
    #
    # ROW MASKING: nv_ref (SMEM scalar) holds the count of rows whose CE the
    # loss actually consumes; callers sort those rows to the front (the
    # positive-only SFG loss multiplies every other row's CE by zero, fwd
    # AND bwd — reference sfg_decoder.py:240-311).  A batch tile past the
    # valid prefix skips ALL its dots and softmax passes; the whole tile
    # body sits in ONE predicated region so the in-body MXU/VPU program-
    # order overlap is preserved (predicating individual pipeline stages
    # was measured to defeat it, 2026-08-20).
    i = pl.program_id(0)
    j = pl.program_id(1)
    nblk = pl.num_programs(1)
    valid = i * Bt < nv_ref[0]

    @pl.when(valid)
    def _():
        @pl.when(j == 0)
        def _():
            m_ref[...] = jnp.full((Bt, 1), _NEG, jnp.float32)
            s_ref[...] = jnp.zeros((Bt, 1), jnp.float32)
            p_ref[...] = jnp.zeros((Bt, 1), jnp.float32)
            sS_ref[...] = jnp.full((Bt, Vb), _DUMMY, jnp.float32)

        S = _dot(h_ref[...], w_ref[...], ((1,), (0,))) + b_ref[...]  # [Bt, Vb]

        def process(blk, jj):
            # jj = -1 processes the _DUMMY priming block: exact no-op (see
            # _DUMMY note; tloc >= Vb so the target pick misses every column)
            mb = jnp.max(blk, axis=1, keepdims=True)
            m_new = jnp.maximum(m_ref[...], mb)
            alpha = jnp.exp(m_ref[...] - m_new)
            s_ref[...] = s_ref[...] * alpha + jnp.sum(
                jnp.exp(blk - m_new), axis=1, keepdims=True
            )
            m_ref[...] = m_new
            tloc = t_ref[...] - jj * Vb  # [Bt, 1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Vb), 1)
            hit = iota == tloc
            p_ref[...] += jnp.sum(
                jnp.where(hit, blk, 0.0), axis=1, keepdims=True
            )

        process(sS_ref[...], j - 1)
        sS_ref[...] = S

        @pl.when(j == nblk - 1)
        def _():
            process(S, j)
            logz = m_ref[...] + jnp.log(s_ref[...])
            logz_ref[...] = logz
            ll_ref[...] = logz - p_ref[...]

    @pl.when(jnp.logical_not(valid) & (j == nblk - 1))
    def _():
        ll_ref[...] = jnp.zeros((Bt, 1), jnp.float32)
        logz_ref[...] = jnp.zeros((Bt, 1), jnp.float32)


def _bwd_kernel(nv_ref, h_ref, w_ref, b_ref, t_ref, logz_ref, g_ref,
                dh_ref, dw_ref, db_ref, dS_s, h_s, *, Bt, Vb):
    # grid (vocab blocks MAJOR, batch tiles minor): dW/db column blocks
    # accumulate over the inner batch loop; dh is resident for the whole run.
    # SOFTWARE-PIPELINED within each vocab block's inner batch loop: the
    # three gradient contractions for batch tile i-1 (reading the dS/h
    # scratches) are independent of tile i's logit dot -> P -> dS chain, so
    # the MXU gradient dots overlap tile i's VPU softmax passes.  The
    # pipeline flushes at the LAST VALID tile (its dS handled eagerly) so no
    # pending state crosses a dw/db block switch.
    #
    # ROW MASKING (see _fwd_kernel): tiles past the sorted valid prefix have
    # g == 0 rows only, so dS == 0 — skipping them changes nothing and saves
    # their recompute dot + 2 exp-sized VPU passes + 3 gradient dots.  The
    # zero-inits stay unconditional so every output block is defined even
    # when nv == 0.
    j = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    nv = nv_ref[0]
    valid = i * Bt < nv
    last_valid = valid & (((i + 1) * Bt >= nv) | (i == nb - 1))

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        # zero the pipeline scratches so the unconditional pending-gradient
        # contractions below are exact no-ops at i == 0 (0 * anything == 0;
        # h_s must be zeroed too lest uninitialized NaNs poison 0*NaN)
        dS_s[...] = jnp.zeros((Bt, Vb), jnp.float32)
        h_s[...] = jnp.zeros_like(h_s)

    @pl.when((j == 0) & (i == 0))
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when(valid)
    def _():
        h = h_ref[...]
        S = _dot(h, w_ref[...], ((1,), (0,))) + b_ref[...]  # [Bt, Vb]

        # pending gradient dots for tile i-1 — unpredicated WITHIN the valid
        # region (predicating individual stages defeats MXU/VPU overlap);
        # at i == 0 the zeroed scratches make this +0
        ip = jnp.maximum(i - 1, 0)
        dS_p = dS_s[...]
        h_p = h_s[...]
        dh_ref[pl.ds(ip * Bt, Bt), :] += _dot(dS_p, w_ref[...], ((1,), (1,)))
        dw_ref[...] += _dot(h_p, dS_p, ((0,), (0,)))  # [K, Vb]
        db_ref[...] += jnp.sum(dS_p, axis=0, keepdims=True)

        P = jnp.exp(S - logz_ref[...])
        tloc = t_ref[...] - j * Vb
        iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Vb), 1)
        onehot = (iota == tloc).astype(jnp.float32)
        dS = (P - onehot) * g_ref[...]  # [Bt, Vb]
        dS_s[...] = dS
        h_s[...] = h

        @pl.when(last_valid)
        def _():
            dh_ref[pl.ds(i * Bt, Bt), :] += _dot(dS, w_ref[...], ((1,), (1,)))
            dw_ref[...] += _dot(h, dS, ((0,), (0,)))
            db_ref[...] += jnp.sum(dS, axis=0, keepdims=True)


def _ceil_to(x, m):
    return (x + m - 1) // m * m


_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ce_core(meta, h, W, b2, t2, nv2):
    ll, _ = _ce_fwd(meta, h, W, b2, t2, nv2)
    return ll


def _ce_fwd(meta, h, W, b2, t2, nv2):
    Bt, Vb = meta
    Bp, K = h.shape
    Vp = W.shape[1]
    grid = (Bp // Bt, Vp // Vb)
    row = lambda i, j: (i, 0)
    col = lambda i, j: (0, j)
    ll, logz = pl.pallas_call(
        functools.partial(_fwd_kernel, Bt=Bt, Vb=Vb),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _SMEM_SPEC,
            pl.BlockSpec((Bt, K), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Vb), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vb), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, Vb), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nv2, h, W, b2, t2)
    return ll, (h, W, b2, t2, nv2, logz)


def _ce_bwd(meta, res, g):
    Bt, Vb = meta
    h, W, b2, t2, nv2, logz = res
    Bp, K = h.shape
    Vp = W.shape[1]
    grid = (Vp // Vb, Bp // Bt)
    row = lambda j, i: (i, 0)
    col = lambda j, i: (0, j)
    full = lambda j, i: (0, 0)
    dh, dW, db = pl.pallas_call(
        functools.partial(_bwd_kernel, Bt=Bt, Vb=Vb),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, K), jnp.float32),
            jax.ShapeDtypeStruct((K, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _SMEM_SPEC,
            pl.BlockSpec((Bt, K), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Vb), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vb), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bp, K), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Vb), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vb), col, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, Vb), jnp.float32),
            pltpu.VMEM((Bt, K), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nv2, h, W, b2, t2, logz, g)
    return dh, dW, db, None, None


_ce_core.defvjp(_ce_fwd, _ce_bwd)


def _fwd_kernel_stacked(nv_ref, h_ref, w_ref, b_ref, t_ref, ll_ref, logz_ref,
                        m_ref, s_ref, p_ref, sS_ref, *, Bt, Vb):
    # grid (head f, batch tile i, vocab block j) — same software pipeline as
    # _fwd_kernel, but all heads share ONE kernel launch so the pipeline
    # never drains between heads and per-call dispatch overhead is paid once.
    # Row masking as in _fwd_kernel (whole-tile skip past the valid prefix).
    i = pl.program_id(1)
    j = pl.program_id(2)
    nblk = pl.num_programs(2)
    valid = i * Bt < nv_ref[0]

    @pl.when(valid)
    def _():
        @pl.when(j == 0)
        def _():
            m_ref[...] = jnp.full((Bt, 1), _NEG, jnp.float32)
            s_ref[...] = jnp.zeros((Bt, 1), jnp.float32)
            p_ref[...] = jnp.zeros((Bt, 1), jnp.float32)
            sS_ref[...] = jnp.full((Bt, Vb), _DUMMY, jnp.float32)

        S = _dot(h_ref[...], w_ref[0], ((1,), (0,))) + b_ref[0]  # [Bt, Vb]

        def process(blk, jj):
            # jj = -1 processes the _DUMMY priming block: exact no-op
            mb = jnp.max(blk, axis=1, keepdims=True)
            m_new = jnp.maximum(m_ref[...], mb)
            alpha = jnp.exp(m_ref[...] - m_new)
            s_ref[...] = s_ref[...] * alpha + jnp.sum(
                jnp.exp(blk - m_new), axis=1, keepdims=True
            )
            m_ref[...] = m_new
            tloc = t_ref[0] - jj * Vb  # [Bt, 1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Vb), 1)
            hit = iota == tloc
            p_ref[...] += jnp.sum(
                jnp.where(hit, blk, 0.0), axis=1, keepdims=True
            )

        process(sS_ref[...], j - 1)
        sS_ref[...] = S

        @pl.when(j == nblk - 1)
        def _():
            process(S, j)
            logz = m_ref[...] + jnp.log(s_ref[...])
            logz_ref[0] = logz
            ll_ref[0] = logz - p_ref[...]

    @pl.when(jnp.logical_not(valid) & (j == nblk - 1))
    def _():
        ll_ref[0] = jnp.zeros((Bt, 1), jnp.float32)
        logz_ref[0] = jnp.zeros((Bt, 1), jnp.float32)


def _bwd_kernel_stacked(nv_ref, h_ref, w_ref, b_ref, t_ref, logz_ref, g_ref,
                        dh_ref, dw_ref, db_ref, dS_s, h_s, *, Bt, Vb):
    # grid (head f, vocab block j MAJOR, batch tile i minor); dh accumulates
    # across heads AND vocab blocks (the trunk hidden state feeds every
    # head), dW/db per (f, j) column block.  Pipelined like _bwd_kernel,
    # row-masked like _bwd_kernel (whole-tile skip past the valid prefix).
    f = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    nv = nv_ref[0]
    valid = i * Bt < nv
    last_valid = valid & (((i + 1) * Bt >= nv) | (i == nb - 1))

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dS_s[...] = jnp.zeros((Bt, Vb), jnp.float32)
        h_s[...] = jnp.zeros_like(h_s)

    @pl.when((f == 0) & (j == 0) & (i == 0))
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when(valid)
    def _():
        h = h_ref[...]
        S = _dot(h, w_ref[0], ((1,), (0,))) + b_ref[0]  # [Bt, Vb]

        # pending-gradient dots, unpredicated within the valid region
        ip = jnp.maximum(i - 1, 0)
        dS_p = dS_s[...]
        h_p = h_s[...]
        dh_ref[pl.ds(ip * Bt, Bt), :] += _dot(dS_p, w_ref[0], ((1,), (1,)))
        dw_ref[0] += _dot(h_p, dS_p, ((0,), (0,)))
        db_ref[0] += jnp.sum(dS_p, axis=0, keepdims=True)

        P = jnp.exp(S - logz_ref[0])
        tloc = t_ref[0] - j * Vb
        iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, Vb), 1)
        onehot = (iota == tloc).astype(jnp.float32)
        dS = (P - onehot) * g_ref[0]  # [Bt, Vb]
        dS_s[...] = dS
        h_s[...] = h

        @pl.when(last_valid)
        def _():
            dh_ref[pl.ds(i * Bt, Bt), :] += _dot(dS, w_ref[0], ((1,), (1,)))
            dw_ref[0] += _dot(h, dS, ((0,), (0,)))
            db_ref[0] += jnp.sum(dS, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ce_core_stacked(meta, h, Ws, bs, ts, nv2):
    ll, _ = _ces_fwd(meta, h, Ws, bs, ts, nv2)
    return ll


def _ces_fwd(meta, h, Ws, bs, ts, nv2):
    Bt, Vb = meta
    Bp, K = h.shape
    F, _, Vp = Ws.shape
    grid = (F, Bp // Bt, Vp // Vb)

    # scalar-prefetch index maps: blocks for tiles past the valid prefix
    # re-point at an already-fetched block index, so Mosaic's block-change
    # detection skips their DMA entirely (the kernel body skips their
    # compute; their inputs are never read)
    def _ieff(i, j, nv_ref):
        return jnp.where(i * Bt < nv_ref[0], i, 0)

    def _jeff(i, j, nv_ref):
        return jnp.where(i * Bt < nv_ref[0], j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, K), lambda f, i, j, nv: (_ieff(i, j, nv), 0)),
            pl.BlockSpec((1, K, Vb),
                         lambda f, i, j, nv: (f, 0, _jeff(i, j, nv))),
            pl.BlockSpec((1, 1, Vb),
                         lambda f, i, j, nv: (f, 0, _jeff(i, j, nv))),
            pl.BlockSpec((1, Bt, 1),
                         lambda f, i, j, nv: (f, _ieff(i, j, nv), 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Bt, 1), lambda f, i, j, nv: (f, i, 0)),
            pl.BlockSpec((1, Bt, 1), lambda f, i, j, nv: (f, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, 1), jnp.float32),
            pltpu.VMEM((Bt, Vb), jnp.float32),
        ],
    )
    ll, logz = pl.pallas_call(
        functools.partial(_fwd_kernel_stacked, Bt=Bt, Vb=Vb),
        out_shape=(
            jax.ShapeDtypeStruct((F, Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((F, Bp, 1), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nv2, h, Ws, bs, ts)
    return ll, (h, Ws, bs, ts, nv2, logz)


def _ces_bwd(meta, res, g):
    Bt, Vb = meta
    h, Ws, bs, ts, nv2, logz = res
    Bp, K = h.shape
    F, _, Vp = Ws.shape
    grid = (F, Vp // Vb, Bp // Bt)

    def _ieff(i, nv_ref):
        return jnp.where(i * Bt < nv_ref[0], i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, K), lambda f, j, i, nv: (_ieff(i, nv), 0)),
            pl.BlockSpec((1, K, Vb), lambda f, j, i, nv: (f, 0, j)),
            pl.BlockSpec((1, 1, Vb), lambda f, j, i, nv: (f, 0, j)),
            pl.BlockSpec((1, Bt, 1),
                         lambda f, j, i, nv: (f, _ieff(i, nv), 0)),
            pl.BlockSpec((1, Bt, 1),
                         lambda f, j, i, nv: (f, _ieff(i, nv), 0)),
            pl.BlockSpec((1, Bt, 1),
                         lambda f, j, i, nv: (f, _ieff(i, nv), 0)),
        ],
        out_specs=(
            pl.BlockSpec((Bp, K), lambda f, j, i, nv: (0, 0)),
            pl.BlockSpec((1, K, Vb), lambda f, j, i, nv: (f, 0, j)),
            pl.BlockSpec((1, 1, Vb), lambda f, j, i, nv: (f, 0, j)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, Vb), jnp.float32),
            pltpu.VMEM((Bt, K), jnp.float32),
        ],
    )
    dh, dW, db = pl.pallas_call(
        functools.partial(_bwd_kernel_stacked, Bt=Bt, Vb=Vb),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, K), jnp.float32),
            jax.ShapeDtypeStruct((F, K, Vp), jnp.float32),
            jax.ShapeDtypeStruct((F, 1, Vp), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nv2, h, Ws, bs, ts, logz, g)
    return dh, dW, db, None, None


_ce_core_stacked.defvjp(_ces_fwd, _ces_bwd)


def _nv_arr(num_valid, B):
    """[1] int32 valid-row count for the SMEM scalar (None -> all rows)."""
    if num_valid is None:
        return jnp.full((1,), B, jnp.int32)
    return jnp.asarray(num_valid, jnp.int32).reshape(1)


def fused_ce_rows_stacked(h, Ws, bs, targets, num_valid=None):
    """Per-row CE for F same-shape heads in ONE kernel launch.

    h: [B, K] shared hidden; Ws: list/stack of F [K, V] kernels; bs: F [V]
    biases; targets: [F, B] int32.  Returns [F, B] fp32.  Heads must share
    K and V (callers bucket heads by padded vocab and pad W/b columns —
    bias pad of _NEG keeps padded columns out of the logsumexp).

    num_valid (optional dynamic scalar): rows >= num_valid are skipped
    entirely (their ll is 0 and they receive/contribute no gradients) —
    callers sort the loss-masked rows to the front (sort_rows_by_mask).
    """
    if not isinstance(Ws, jnp.ndarray):
        Ws = jnp.stack([w.astype(jnp.float32) for w in Ws])
        bs = jnp.stack([b.astype(jnp.float32) for b in bs])
    F, K, V = Ws.shape
    B = h.shape[0]
    Bt = min(_BT, _ceil_to(B, 8))
    Bp = _ceil_to(B, Bt)
    Vb = min(_VB, _ceil_to(V, 128))
    Vp = _ceil_to(V, Vb)
    hp = jnp.pad(h.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    Wp = jnp.pad(Ws, ((0, 0), (0, 0), (0, Vp - V)))
    bp = jnp.pad(
        bs, ((0, 0), (0, Vp - V)), constant_values=_NEG
    ).reshape(F, 1, Vp)
    tp = jnp.pad(
        targets.astype(jnp.int32), ((0, 0), (0, Bp - B))
    ).reshape(F, Bp, 1)
    ll = _ce_core_stacked((Bt, Vb), hp, Wp, bp, tp, _nv_arr(num_valid, B))
    ll = ll[:, :B, 0]
    if num_valid is not None:
        # the straddling batch tile computes real values for rows >=
        # num_valid; zero them so the contract (ll == 0, no gradients for
        # skipped rows) holds exactly regardless of the caller's masking
        keep = (
            jnp.arange(B) < jnp.asarray(num_valid, jnp.int32)
        ).astype(ll.dtype)
        ll = ll * keep[None, :]
    return ll


def fused_ce_rows(h, W, b, targets, num_valid=None):
    """Per-row softmax cross-entropy ``logsumexp(h@W+b) - (h@W+b)[target]``
    without materializing the [B, V] logits (semantics of reference
    ``sfg_decoder.py:240-311``'s per-feature CE, reduction='none').

    h: [B, K] fp32, W: [K, V], b: [V], targets: int32 [B] -> fp32 [B].
    Differentiable in h, W, b (custom VJP; logit blocks recomputed).
    num_valid: see :func:`fused_ce_rows_stacked`.
    """
    B, K = h.shape
    V = W.shape[1]
    Bt = min(_BT, _ceil_to(B, 8))
    Bp = _ceil_to(B, Bt)
    Vb = min(_VB, _ceil_to(V, 128))
    Vp = _ceil_to(V, Vb)
    hp = jnp.pad(h.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    Wp = jnp.pad(W.astype(jnp.float32), ((0, 0), (0, Vp - V)))
    bp = jnp.pad(
        b.astype(jnp.float32), (0, Vp - V), constant_values=_NEG
    ).reshape(1, Vp)
    tp = jnp.pad(targets.reshape(-1, 1).astype(jnp.int32), ((0, Bp - B), (0, 0)))
    ll = _ce_core((Bt, Vb), hp, Wp, bp, tp, _nv_arr(num_valid, B))
    ll = ll[:B, 0]
    if num_valid is not None:
        # see fused_ce_rows_stacked: make the skipped-row contract exact
        # for the straddling batch tile too
        keep = (
            jnp.arange(B) < jnp.asarray(num_valid, jnp.int32)
        ).astype(ll.dtype)
        ll = ll * keep
    return ll


# ---------------------------------------------------------------------------
# row-permutation helpers for the masked-CE path
# ---------------------------------------------------------------------------


@jax.custom_vjp
def permute_rows(x, perm, inv):
    """``x[perm]`` along axis 0 whose backward is a GATHER by the inverse
    permutation instead of XLA's serialized scatter-add (perm must be a
    permutation and inv its inverse — true for argsort outputs)."""
    return jnp.take(x, perm, axis=0)


def _perm_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0), (perm, inv)


def _perm_bwd(res, g):
    perm, inv = res
    return jnp.take(g, inv, axis=0), None, None


permute_rows.defvjp(_perm_fwd, _perm_bwd)


@jax.custom_vjp
def unpermute_cols(x, perm, inv):
    """``x[:, inv]`` along axis 1 (undo a row sort on per-head [F, B] CE
    values); backward gathers by ``perm``."""
    return jnp.take(x, inv, axis=1)


def _unperm_fwd(x, perm, inv):
    return jnp.take(x, inv, axis=1), (perm, inv)


def _unperm_bwd(res, g):
    perm, inv = res
    return jnp.take(g, perm, axis=1), None, None


unpermute_cols.defvjp(_unperm_fwd, _unperm_bwd)


def sort_rows_by_mask(mask):
    """(perm, inv, num_valid) putting rows with mask > 0 first (stable).

    The SFG loss multiplies every masked-out row's CE by zero — forward and
    backward — so the CE kernels can skip whole batch tiles past the valid
    prefix (reference semantics: ``sfg_decoder.py:240-311`` positive_only +
    the engine's padded-tail sample_mask)."""
    mask = mask.reshape(-1)
    perm = jnp.argsort(jnp.where(mask > 0, 0, 1), stable=True)
    inv = jnp.argsort(perm)
    num_valid = jnp.sum((mask > 0).astype(jnp.int32))
    return perm, inv, num_valid
