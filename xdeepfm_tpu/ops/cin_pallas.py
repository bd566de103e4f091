"""Fused Pallas TPU kernel for the CIN layer contraction.

Math (reference ``deepctr/layers/interaction.py:216-224``):

    out[b,o,d] = sum_{h,m} W[o, h*M+m] * x_k[b,h,d] * x_0[b,m,d] + bias[o]

The torch reference (and a naive XLA lowering) materializes the outer-product
tensor z = [B, H*M, D] in HBM (~1 GB/layer at B=4096).  This kernel reorders to
rows r=(b,d) and decomposes over the small M axis:

    out[r, :] = sum_m ( xk[r, :] * x0[r, m] ) @ Wm      with Wm = W3[:, :, m].T

Each m-step is a [R, H] lane-broadcast multiply (VPU) feeding a [R,H]x[H,O]
matmul (MXU) accumulated in VMEM — z never exists in HBM and every matmul has
K=H (MXU-friendly).  The backward pass reuses the SAME kernel with permuted
weight layouts:

    dxk = F(g, x0, Wp2),  Wp2[m, o, h] = W3[o, h, m]
    dx0 = F(g, xk, Wp4),  Wp4[h, o, m] = W3[o, h, m]

and dW accumulates G^T (xk * x0_m) tile-by-tile in a second kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# When the weight tensor W[M, H, O] (plus its double buffer and the unrolled
# loop temporaries) would crowd the ~16 MB VMEM scope, chunk over H — the only
# axis that is lane-legal to block (chunks must be 128-divisible; M cannot be
# dynamically indexed on lanes).  Partial H sums accumulate in the out block.
_W_VMEM_BUDGET = 3 * 1024 * 1024


def _h_chunk(H: int, M: int, O: int) -> int:
    if M * H * O * 4 <= _W_VMEM_BUDGET:
        return H
    if H % 128 == 0:
        hc = 128
        while M * hc * O * 4 > _W_VMEM_BUDGET and hc > 128:
            hc -= 128
        return hc
    return H  # not chunkable; rely on the small-W fast path


def _fwd_kernel(a_ref, c_ref, w_ref, b_ref, out_ref, *, M):
    # a_ref: [R, Hc]; c_ref: [R, M]; w_ref: [M, Hc, O]; b_ref: [1, O]
    j = pl.program_id(1)
    a = a_ref[:]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for m in range(M):
        zm = a * c_ref[:, m : m + 1]  # [R, Hc] lane-broadcast multiply
        acc = acc + jnp.dot(zm, w_ref[m], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc + b_ref[0, :][None, :]

    @pl.when(j != 0)
    def _():
        out_ref[:] += acc


def _r_for_m(R, M):
    """Mosaic stack-allocates the unrolled m-loop's [R, Hc] temporaries, so
    bound R such that M * R * 128 lanes of fp32 stays well under the ~16 MB
    VMEM scope."""
    if M <= 32:
        return R
    if M <= 64:
        return min(R, 128)
    if M <= 128:
        return min(R, 64)
    return min(R, 32)


def _fused_contract(a_r, c_r, Wr, bias, *, R, interpret=False):
    """a_r: [N, H]; c_r: [N, M]; Wr: [M, H, O]; bias: [O] -> [N, O]."""
    N, H = a_r.shape
    M = c_r.shape[1]
    O = Wr.shape[2]
    R = _r_for_m(R, M)
    Hc = _h_chunk(H, M, O)
    kernel = functools.partial(_fwd_kernel, M=M)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        grid=(N // R, H // Hc),
        in_specs=[
            pl.BlockSpec((R, Hc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (M, Hc, O), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, O), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, O), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # v5e VMEM is 128 MB; the
            # default 16 MB scoped limit rejects the larger backward variants
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * M * O,
            bytes_accessed=4 * (N * H + N * M + M * H * O + N * O),
            transcendentals=0,
        ),
    )(a_r, c_r, Wr, bias.reshape(1, -1))


def _dw_kernel(g_ref, a_ref, c_ref, dw_ref, *, M):
    # g_ref: [R, O]; a_ref: [R, Hc]; c_ref: [R, M]; dw_ref: [M, O, Hc]
    # grid (h-chunk j, row-tile i): i fastest -> dw block j revisited across i.
    i = pl.program_id(1)
    a = a_ref[:]
    g = g_ref[:]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for m in range(M):
        zm = a * c_ref[:, m : m + 1]  # [R, Hc]
        dw_ref[m] += jax.lax.dot_general(
            g, zm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [O, Hc]


def _dw_contract(g_r, a_r, c_r, *, R, interpret=False):
    """dW[m, o, h] = sum_n g[n,o] a[n,h] c[n,m]."""
    N, H = a_r.shape
    M = c_r.shape[1]
    O = g_r.shape[1]
    R = _r_for_m(R, M)
    Hc = _h_chunk(H, M, O)
    kernel = functools.partial(_dw_kernel, M=M)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, O, H), jnp.float32),
        grid=(H // Hc, N // R),
        in_specs=[
            pl.BlockSpec((R, O), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Hc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (M, O, Hc), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(g_r, a_r, c_r)


def _bwd_kernel(gT_ref, aT_ref, cT_ref, wT_ref, dxkT_ref, dx0T_ref, dw_ref,
                *, H, Mp):
    """Transposed fused backward (one row tile of R columns).

    The standard backward decomposition (dxk/dx0 as forward-kernel calls with
    permuted weights) emits matmuls whose OUTPUT width is H or M (26 for
    Criteo) — ~20% of the 128-lane MXU, measured 5-10x the forward's time.
    Here everything is computed in the transposed domain where the output
    lane axis is the R=256-wide row tile:

        Z  = W^T @ g^T                  [H*Mp, R]  one wide matmul (MXU)
        dxk^T = sum_m Z[h,m,:] * c^T[m] [H, R]     sublane reduction (VPU)
        dx0^T = sum_h Z[h,m,:] * a^T[h] [Mp, R]    leading-axis reduction (VPU)
        dW   += (a^T x c^T) @_R g^T     [H*Mp, O]  lane-contracted matmul (MXU)

    Total MXU work is 2x the forward FLOPs (dxk and dx0 share Z) at full
    lane width, vs 3x at ~20% width for the standard decomposition.  M pads
    to Mp (multiple of the 8-row sublane tile) so the [H*Mp, R] -> [H, Mp, R]
    reshape is layout-preserving.
    """
    i = pl.program_id(0)
    gT = gT_ref[:]
    Z = jnp.dot(wT_ref[:], gT, preferred_element_type=jnp.float32)
    R = Z.shape[1]
    Z3 = Z.reshape(H, Mp, R)
    a3 = aT_ref[:].reshape(H, 1, R)
    c3 = cT_ref[:].reshape(1, Mp, R)
    dxkT_ref[:] = jnp.sum(Z3 * c3, axis=1)
    dx0T_ref[:] = jnp.sum(Z3 * a3, axis=0)
    Y = (a3 * c3).reshape(H * Mp, R)
    dw = jax.lax.dot_general(
        Y, gT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(i != 0)
    def _():
        dw_ref[:] += dw


def _bwd_fused_t(g, a, c, W, *, interpret=False):
    """dxk [N,H], dx0 [N,M], dW [O,H*M] via the transposed fused kernel."""
    N, H = a.shape
    M = c.shape[1]
    O = W.shape[0]
    Mp = _round_up(M, 8)
    R = _row_tile(N)
    Np = _round_up(N, R)
    ct = _compute_dtype()
    if Np != N:
        pad = ((0, Np - N), (0, 0))
        g = jnp.pad(g, pad)
        a = jnp.pad(a, pad)
        c = jnp.pad(c, pad)
    gT = g.T.astype(ct)
    aT = a.T.astype(jnp.float32)
    cT = jnp.pad(c, ((0, 0), (0, Mp - M))).T.astype(jnp.float32)
    W3 = jnp.pad(W.reshape(O, H, M), ((0, 0), (0, 0), (0, Mp - M)))
    WT = W3.transpose(1, 2, 0).reshape(H * Mp, O).astype(ct)
    kernel = functools.partial(_bwd_kernel, H=H, Mp=Mp)
    dxkT, dx0T, dWp = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, Np), jnp.float32),
            jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
            jax.ShapeDtypeStruct((H * Mp, O), jnp.float32),
        ),
        grid=(Np // R,),
        in_specs=[
            pl.BlockSpec((O, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (H * Mp, O), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((H, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (H * Mp, O), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Np * H * Mp * O,
            bytes_accessed=4 * (Np * (O + H + Mp) + 2 * H * Mp * O
                                + Np * (H + Mp)),
            transcendentals=0,
        ),
    )(gT, aT, cT, WT)
    dxk = dxkT.T[:N]
    dx0 = dx0T.T[:N, :M]
    dW = (
        dWp.reshape(H, Mp, O)[:, :M]
        .transpose(2, 0, 1)
        .reshape(O, H * M)
    )
    return dxk, dx0, dW


# Backward implementation: 'fused_t' (transposed wide-lane kernel, default),
# 'legacy' (forward-kernel reuse with permuted weights).  'auto' falls back
# to legacy only when the fused kernel's VMEM working set would not fit.
_BWD_IMPL = "auto"
_BWD_VMEM_BUDGET = 80 * 1024 * 1024


def set_backward_impl(name: str):
    global _BWD_IMPL
    assert name in ("auto", "fused_t", "legacy")
    _BWD_IMPL = name


def _bwd_fused_fits(N, H, M, O):
    Mp = _round_up(M, 8)
    R = _row_tile(N)
    # Z + Y [H*Mp, R] fp32, WT + dw [H*Mp, O]
    return H * Mp * (2 * R + 2 * O) * 4 <= _BWD_VMEM_BUDGET


def _to_rows(x):
    """[B, F, D] -> [B*D, F] (row = one (b, d) slice)."""
    B, F, D = x.shape
    return x.transpose(0, 2, 1).reshape(B * D, F)


def _from_rows(r, B, D):
    """[B*D, O] -> [B, O, D]."""
    O = r.shape[1]
    return r.reshape(B, D, O).transpose(0, 2, 1)


def _pad_rows(x, R):
    N = x.shape[0]
    Np = _round_up(N, R)
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    return x


_INTERPRET = False
_PRECISION = "f32"


def set_interpret(flag: bool):
    """Interpreter mode for CPU testing."""
    global _INTERPRET
    _INTERPRET = flag


def set_cin_precision(p: str):
    """'f32' (default) or 'bf16' — bf16 inputs with f32 accumulation doubles
    MXU rate at CTR-insignificant precision cost."""
    global _PRECISION
    assert p in ("f32", "bf16")
    _PRECISION = p


def _compute_dtype():
    return jnp.bfloat16 if _PRECISION == "bf16" else jnp.float32


def _row_tile(n_rows):
    return 256 if n_rows >= 256 else _round_up(n_rows, 8)


def _w_forward_layout(W, H, M):
    O = W.shape[0]
    return W.reshape(O, H, M).transpose(2, 1, 0)  # [M, H, O]


def _forward_rows_flat(a_r, c_r, Wr, bias):
    """a_r: [N, F1]; c_r: [N, F2]; Wr: [F2, F1, O] -> [N, O] (N padded
    internally)."""
    N = a_r.shape[0]
    R = _row_tile(N)
    ct = _compute_dtype()
    a_p = _pad_rows(a_r, R).astype(ct)
    c_p = _pad_rows(c_r, R).astype(ct)
    out = _fused_contract(
        a_p, c_p, Wr.astype(ct), bias.astype(jnp.float32),
        R=R, interpret=_INTERPRET,
    )
    return out[:N]


@jax.custom_vjp
def cin_pallas_rows(h_rows, x0_rows, W, b):
    """Row-major CIN layer: h_rows [N, H], x0_rows [N, M] (rows are (b, d)
    slices), W [O, H*M] (channel = h*M + m), b [O] -> [N, O].

    Keeping the whole CIN stack in row form avoids the [B,F,D]<->[N,F]
    relayouts between layers."""
    out, _ = _cin_rows_fwd(h_rows, x0_rows, W, b)
    return out


def _cin_rows_fwd(h_rows, x0_rows, W, b):
    H = h_rows.shape[1]
    M = x0_rows.shape[1]
    out = _forward_rows_flat(h_rows, x0_rows, _w_forward_layout(W, H, M), b)
    return out, (h_rows, x0_rows, W)


def _cin_rows_bwd(res, g):
    h_rows, x0_rows, W = res
    H = h_rows.shape[1]
    M = x0_rows.shape[1]
    O = W.shape[0]
    N = h_rows.shape[0]
    db = jnp.sum(g, axis=0)
    use_fused = _BWD_IMPL == "fused_t" or (
        _BWD_IMPL == "auto" and _bwd_fused_fits(N, H, M, O)
    )
    if use_fused:
        dxk, dx0, dW = _bwd_fused_t(
            g, h_rows, x0_rows, W, interpret=_INTERPRET
        )
        return dxk, dx0, dW.astype(W.dtype), db
    W3 = W.reshape(O, H, M)
    dxk = _forward_rows_flat(
        g, x0_rows, W3.transpose(2, 0, 1), jnp.zeros((H,), W.dtype)
    )
    dx0 = _forward_rows_flat(
        g, h_rows, W3.transpose(1, 0, 2), jnp.zeros((M,), W.dtype)
    )
    R = _row_tile(N)
    g_r = _pad_rows(g, R).astype(jnp.float32)
    a_r = _pad_rows(h_rows, R).astype(jnp.float32)
    c_r = _pad_rows(x0_rows, R).astype(jnp.float32)
    dW_moh = _dw_contract(g_r, a_r, c_r, R=R, interpret=_INTERPRET)  # [M,O,H]
    dW = dW_moh.transpose(1, 2, 0).reshape(O, H * M).astype(W.dtype)
    return dxk, dx0, dW, db


cin_pallas_rows.defvjp(_cin_rows_fwd, _cin_rows_bwd)


def cin_pallas(h, x0, W, b):
    """Drop-in for ``cin_layer_contract``: h [B,H,D], x0 [B,M,D],
    W [O, H*M] (channel = h*M + m), b [O] -> [B, O, D]."""
    B, H, D = h.shape
    out_r = cin_pallas_rows(_to_rows(h), _to_rows(x0), W, b)
    return _from_rows(out_r, B, D)
