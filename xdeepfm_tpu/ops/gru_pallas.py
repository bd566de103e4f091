"""Blocked GRU/AGRU/AUGRU recurrence kernel for DIEN-shaped sequences.

The reference iterates PackedSequence chunks in a Python loop
(``deepctr/layers/sequence.py:296-320``); the lax.scan port is semantically
identical but OVERHEAD-bound on TPU: a DIEN-shaped step is ~[3H=30, B=4096]
of math (microseconds) wrapped in per-step dynamic-slice / dynamic-update /
scheduling costs, and the fwd+bwd pair walks the T=50 loop four times
(measured 4.35 ms of DIEN's 8.79 ms step; scripts/bench_dien_probe.py).

This kernel runs the ENTIRE recurrence for a tile of batch columns inside
one Pallas program: the hidden state lives in registers/VMEM across all T
steps, the per-gate weights [H, H] stay VMEM-resident, and the T loop is
statically unrolled so Mosaic schedules across steps.  The backward is
flash-style: it re-runs the forward INSIDE the kernel, keeping the per-step
hidden/gate history in VMEM scratch (never HBM), then walks the steps in
reverse accumulating dW/db in VMEM.

Layouts (transposed lane space, batch on the 128-lane axis — matching the
scan path's [3H, B] design):
  gi    [T, 3, H, B]   hoisted input gates  x_t @ W_ih^T + b_ih  (r, z, n)
  w     [3, H, H]      recurrent weights, gate-major
  b     [3, H, 1]      recurrent bias
  att   [T, 1, B]      attention scores (ignored for cell='gru')
  valid [T, 1, B]      sequence mask as float
  h0    [H, B]
  outs  [T, H, B]      h after each step; FROZEN past each row's length
                       (callers needing zeroed padded outputs multiply by
                       valid outside — the cotangent folds in naturally).

Cell semantics (exactly the scan cells in nn/sequence.py, reference
``sequence.py:192-282``), written as h' = h + u*(n - h):
  gru   u = 1 - sigmoid(i_z + h_z)          (torch GRU update)
  agru  u = att                             (score replaces the gate)
  augru u = att * sigmoid(i_z + h_z)        (attentional update gate)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_BACKEND = "auto"


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


def set_backend(name: str):
    """'auto' (kernel on single-chip TPU, lax.scan elsewhere), 'xla',
    or 'pallas'."""
    global _BACKEND
    assert name in ("auto", "xla", "pallas")
    _BACKEND = name


def use_pallas() -> bool:
    be = _BACKEND
    if be == "xla":  # explicit XLA beats interpret (A/B tests need 2 paths)
        return False
    if _INTERPRET:
        return True
    if be == "auto":
        try:
            return (
                jax.default_backend() == "tpu" and len(jax.devices()) == 1
            )
        except Exception:
            return False
    return be == "pallas"


def _mm(a, bmat):
    return jax.lax.dot_general(
        a, bmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _step_fwd(cell, gi_r, gi_z, gi_n, a, v, h, w0, w1, w2, b0, b1, b2):
    """One cell step; returns (h_out, r, zu, n, hn) for reuse in backward."""
    hr = _mm(w0, h) + b0
    hn = _mm(w2, h) + b2
    r = jax.nn.sigmoid(gi_r + hr)
    n = jnp.tanh(gi_n + r * hn)
    if cell == "agru":
        zu = None
        u = a
    else:
        zu = jax.nn.sigmoid(gi_z + _mm(w1, h) + b1)
        u = (1.0 - zu) if cell == "gru" else a * zu
    h_out = h + (v * u) * (n - h)
    return h_out, r, zu, n, hn


def _fwd_kernel(gi_ref, w_ref, b_ref, att_ref, valid_ref, h0_ref, out_ref,
                *, T, cell):
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    b0, b1, b2 = b_ref[0], b_ref[1], b_ref[2]
    h = h0_ref[...]
    for t in range(T):
        h, _, _, _, _ = _step_fwd(
            cell, gi_ref[t, 0], gi_ref[t, 1], gi_ref[t, 2],
            att_ref[t], valid_ref[t], h, w0, w1, w2, b0, b1, b2,
        )
        out_ref[t] = h


def _bwd_kernel(gi_ref, w_ref, b_ref, att_ref, valid_ref, h0_ref, g_ref,
                dgi_ref, dw_ref, db_ref, datt_ref, dh0_ref,
                h_s, r_s, zu_s, n_s, hn_s, *, T, cell):
    w0, w1, w2 = w_ref[0], w_ref[1], w_ref[2]
    b0, b1, b2 = b_ref[0], b_ref[1], b_ref[2]
    # forward replay entirely in VMEM (h/gate history never touches HBM)
    h = h0_ref[...]
    for t in range(T):
        h, r, zu, n, hn = _step_fwd(
            cell, gi_ref[t, 0], gi_ref[t, 1], gi_ref[t, 2],
            att_ref[t], valid_ref[t], h, w0, w1, w2, b0, b1, b2,
        )
        h_s[t], r_s[t], n_s[t], hn_s[t] = h, r, n, hn
        if cell != "agru":
            zu_s[t] = zu
    # reverse sweep; dW/db accumulate in VMEM, stream out once per tile
    dh = jnp.zeros_like(h)
    dw0 = jnp.zeros_like(w0)
    dw1 = jnp.zeros_like(w1)
    dw2 = jnp.zeros_like(w2)
    db0 = jnp.zeros_like(b0)
    db1 = jnp.zeros_like(b1)
    db2 = jnp.zeros_like(b2)
    for t in range(T - 1, -1, -1):
        h_prev = h_s[t - 1] if t > 0 else h0_ref[...]
        r, n, hn = r_s[t], n_s[t], hn_s[t]
        a, v = att_ref[t], valid_ref[t]
        if cell == "agru":
            u = a
        elif cell == "gru":
            zu = zu_s[t]
            u = 1.0 - zu
        else:
            zu = zu_s[t]
            u = a * zu
        ua = v * u
        D = g_ref[t] + dh                       # [H, B]
        nmh = n - h_prev
        dua = D * nmh
        dn = D * ua
        dh_prev = D * (1.0 - ua)
        du = v * dua
        if cell == "agru":
            datt_ref[t] = jnp.sum(du, axis=0, keepdims=True)
            dzu_pre = None
        else:
            if cell == "gru":
                dzu = -du
            else:
                datt_ref[t] = jnp.sum(du * zu, axis=0, keepdims=True)
                dzu = du * a
            dzu_pre = dzu * zu * (1.0 - zu)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dhn = dn_pre * r
        dr_pre = dr * r * (1.0 - r)
        # gh_g = w_g @ h_prev + b_g
        hp_t = h_prev.T
        dh_prev = dh_prev + _mm(w0.T, dr_pre) + _mm(w2.T, dhn)
        dw0 = dw0 + _mm(dr_pre, hp_t)
        dw2 = dw2 + _mm(dhn, hp_t)
        db0 = db0 + jnp.sum(dr_pre, axis=1, keepdims=True)
        db2 = db2 + jnp.sum(dhn, axis=1, keepdims=True)
        dgi_ref[t, 0] = dr_pre
        dgi_ref[t, 2] = dn_pre
        if dzu_pre is None:
            dgi_ref[t, 1] = jnp.zeros_like(dn_pre)
        else:
            dh_prev = dh_prev + _mm(w1.T, dzu_pre)
            dw1 = dw1 + _mm(dzu_pre, hp_t)
            db1 = db1 + jnp.sum(dzu_pre, axis=1, keepdims=True)
            dgi_ref[t, 1] = dzu_pre
        dh = dh_prev
    dh0_ref[...] = dh
    dw_ref[0, 0], dw_ref[0, 1], dw_ref[0, 2] = dw0, dw1, dw2
    db_ref[0, 0], db_ref[0, 1], db_ref[0, 2] = db0, db1, db2


def _pick_bt(B):
    # Bt sits on the LANE (minor) axis of every block: Mosaic requires it
    # to be a multiple of 128 or the whole axis (CLAUDE.md round-3 rule) —
    # sub-128 divisors compile in interpret mode but fail on real TPU
    for bt in (512, 256, 128):
        if B % bt == 0 and bt <= B:
            return bt
    return B  # whole-axis block; fits_vmem gates the fallback


def fits_vmem(T: int, H: int, B: int) -> bool:
    """True if the backward's VMEM working set fits comfortably: the gi /
    dgi blocks plus the five [T, H, Bt] history scratches at the tile size
    `_pick_bt` would choose.  Callers (GRU / DynamicGRU) fall back to the
    lax.scan path when this fails — e.g. odd batch sizes that force Bt == B,
    or very long sequences."""
    bt = _pick_bt(B)
    hp = -(-H // 8) * 8  # sublane padding
    blocks = 2 * T * 3 * hp * bt  # gi in + dgi out
    scratch = 5 * T * hp * bt     # h/r/zu/n/hn histories
    # plus the incoming cotangent block g [T, H, Bt] and the outs history the
    # forward leaves resident for it — previously omitted, which understated
    # the working set vs the 100 MB vmem_limit_bytes guard.
    cotangent = 2 * T * hp * bt
    return 4 * (blocks + scratch + cotangent) <= 64 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_scan_f32(cell, gi, w, b, att, valid, h0):
    out, _ = _gs_fwd(cell, gi, w, b, att, valid, h0)
    return out


def gru_scan(cell, gi, w, b, att, valid, h0):
    """Run the full recurrence; returns outs [T, H, B] (frozen past length)
    in the input dtype.

    cell in ('gru', 'agru', 'augru').  See module docstring for layouts.
    The kernel computes in fp32 (its out_shapes and scratches are fp32);
    non-f32 inputs are cast in and the result cast back so the custom-VJP
    primal/cotangent dtypes stay consistent (the casts' transposes handle
    the cotangent side) and the fallback lax.scan path's dtype contract is
    preserved."""
    dt = gi.dtype
    f32 = jnp.float32
    out = _gru_scan_f32(
        cell, gi.astype(f32), w.astype(f32), b.astype(f32),
        att.astype(f32), valid.astype(f32), h0.astype(f32),
    )
    return out.astype(dt)


def _gs_fwd(cell, gi, w, b, att, valid, h0):
    T, _, H, B = gi.shape
    Bt = _pick_bt(B)
    grid = (B // Bt,)
    gid = pl.BlockSpec((T, 3, H, Bt), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((3, H, H), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((3, H, 1), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    tb = pl.BlockSpec((T, 1, Bt), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    hb = pl.BlockSpec((H, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((T, H, Bt), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, T=T, cell=cell)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, B), jnp.float32),
        grid=grid,
        in_specs=[gid, w_s, b_s, tb, tb, hb],
        out_specs=ob,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(gi, w, b, att, valid, h0)
    return out, (gi, w, b, att, valid, h0)


def _gs_bwd(cell, res, g):
    gi, w, b, att, valid, h0 = res
    T, _, H, B = gi.shape
    Bt = _pick_bt(B)
    nt = B // Bt
    gid = pl.BlockSpec((T, 3, H, Bt), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((3, H, H), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((3, H, 1), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    tb = pl.BlockSpec((T, 1, Bt), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    hb = pl.BlockSpec((H, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((T, H, Bt), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    dw_s = pl.BlockSpec((1, 3, H, H), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    db_s = pl.BlockSpec((1, 3, H, 1), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, T=T, cell=cell)
    scratch = [pltpu.VMEM((T, H, Bt), jnp.float32) for _ in range(5)]
    dgi, dw_t, db_t, datt, dh0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 3, H, B), jnp.float32),
            jax.ShapeDtypeStruct((nt, 3, H, H), jnp.float32),
            jax.ShapeDtypeStruct((nt, 3, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((H, B), jnp.float32),
        ),
        grid=(nt,),
        in_specs=[gid, w_s, b_s, tb, tb, hb, ob],
        out_specs=(gid, dw_s, db_s, tb, hb),
        scratch_shapes=scratch,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(gi, w, b, att, valid, h0, g)
    dw = jnp.sum(dw_t, axis=0)
    db = jnp.sum(db_t, axis=0)
    if cell == "gru":
        datt = jnp.zeros_like(att)
    return dgi, dw, db, datt, jnp.zeros_like(valid), dh0


_gru_scan_f32.defvjp(_gs_fwd, _gs_bwd)
