"""Row-sharded embedding lookup over the ``embed`` mesh axis.

The reference replicates every ``nn.Embedding`` on one device
(``inputs.py:167-180``) — its missing piece at scale (SURVEY.md §2h).  Here the
stacked table [rows, dim] row-shards contiguously across the ``embed`` axis and
lookups run under ``shard_map``:

  each shard gathers the ids it owns (masked local take) and a single
  ``psum`` over ``embed`` combines the partial rows — ids travel nowhere,
  one [B, F, D] reduce rides ICI per lookup.

Backward is automatic: d(psum) is identity per shard, so each shard's gradient
scatter-adds only into its own rows (no gradient exchange for the tables).

Three modes:
* ``gspmd`` (default): plain ``jnp.take`` on a row-sharded table; XLA GSPMD
  partitions the gather itself.  Always correct, good baseline.
* ``shard_map``: the explicit kernel above — deterministic collective schedule;
  moves one full [B, F, D] reduce over the ``embed`` axis per lookup.
* ``all_to_all``: the pod-scale exchange (SURVEY.md §7 hard part #1) — ids are
  deduplicated and routed to their owning shard, the owner gathers its rows,
  and rows travel back: each unique row crosses the interconnect ONCE instead
  of being reduced ``embed``-size times.  Backward is a custom VJP that
  segment-sums duplicate cotangents locally and reverses the exchange, so
  table gradients scatter-add shard-locally.  On TPU the transfers use
  ``lax.ragged_all_to_all`` (only actual rows ride ICI); on backends without
  that primitive (XLA:CPU test meshes) a dense ``lax.all_to_all`` with the
  same block layout emulates it bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MODE = "gspmd"
_MESH: Optional[Mesh] = None
_RAGGED: Optional[bool] = None  # None = auto (TPU yes, others no)
_COMM_DTYPE = None  # None = full precision; jnp.bfloat16 halves row bytes


def set_embedding_mode(mode: str, mesh: Optional[Mesh] = None,
                       ragged: Optional[bool] = None, comm_dtype=None):
    """mode in {'gspmd', 'shard_map', 'all_to_all'}; the latter two require a
    mesh with ('data', 'embed') axes.  ragged forces/disables the
    ragged_all_to_all transfer primitive (default: auto-detect by backend).
    comm_dtype (all_to_all only): cast embedding rows / row cotangents to this
    dtype for the wire trip (e.g. jnp.bfloat16 — half the ICI bytes; ids stay
    int32, table storage and math stay fp32)."""
    global _MODE, _MESH, _RAGGED, _COMM_DTYPE
    assert mode in ("gspmd", "shard_map", "all_to_all")
    _MODE = mode
    _MESH = mesh
    _RAGGED = ragged
    _COMM_DTYPE = comm_dtype


def _use_ragged():
    if _RAGGED is not None:
        return _RAGGED
    return jax.default_backend() == "tpu"


def _default_ragged_a2a(operand, output, input_offsets, send_sizes,
                        output_offsets, recv_sizes, *, axis_name):
    return jax.lax.ragged_all_to_all(
        operand, output, input_offsets, send_sizes, output_offsets,
        recv_sizes, axis_name=axis_name,
    )


# Injectable primitive: ``lax.ragged_all_to_all`` is unimplemented on
# XLA:CPU, so CPU-mesh tests swap in a pure-JAX emulation of its documented
# offset/size semantics (parallel/ragged_emu.py) and force ragged=True —
# executing the REAL argument plumbing below (in_off/send_sizes/out_off/
# recv_sizes) that otherwise only runs on multi-chip TPU hardware.
_ragged_a2a = _default_ragged_a2a


def set_ragged_a2a_impl(fn=None):
    """Override the ragged_all_to_all primitive (None restores the real
    one).  Test hook — see parallel/ragged_emu.py."""
    global _ragged_a2a
    _ragged_a2a = fn if fn is not None else _default_ragged_a2a


def get_embedding_mode():
    return _MODE, _MESH


def sharded_lookup(table, ids, mesh: Mesh, data_axis="data",
                   embed_axis="embed", width=None):
    """table: [rows, dim] sharded P(embed, None); ids: int32 [...] sharded
    P(data, ...) -> values [..., dim] sharded P(data, ...).

    rows must divide evenly by the embed-axis size (pad tables when stacking).
    ``width`` (packed [rows, (1+k)*D] tables): return only the first
    ``width`` columns — sliced BEFORE the psum so only param columns ride
    the interconnect.
    """

    def local_lookup(table_shard, ids_local):
        e = jax.lax.axis_index(embed_axis)
        S = table_shard.shape[0]
        local = ids_local - e * S
        in_range = (local >= 0) & (local < S)
        safe = jnp.clip(local, 0, S - 1)
        vals = jnp.take(table_shard, safe, axis=0)
        if width is not None:
            vals = vals[..., :width]
        vals = jnp.where(in_range[..., None], vals, 0.0)
        return jax.lax.psum(vals, embed_axis)

    ids_spec = P(data_axis, *([None] * (ids.ndim - 1)))
    out_spec = P(data_axis, *([None] * ids.ndim))
    return jax.shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(embed_axis, None), ids_spec),
        out_specs=out_spec,
    )(table, ids)


# --------------------------------------------------------------------------
# all_to_all mode: dedup + route ids to owners, rows travel back once.
# --------------------------------------------------------------------------


def _sizes_exchange(sizes, axis):
    """all_to_all a per-peer [E] vector: element j goes to peer j; returns the
    vector of values received (element i = what peer i sent me)."""
    return jax.lax.all_to_all(sizes[:, None], axis, 0, 0).reshape(-1)


def _exchange_to_blocks(x, in_off, send_sizes, axis, E, cap,
                        recv_sizes=None):
    """Send x[in_off[j] : in_off[j]+send_sizes[j]] to peer j.  Returns a
    [E*cap, ...] buffer in per-SENDER block layout (block i = rows from peer
    i, valid prefix length = recv_sizes[i]).  ``recv_sizes`` (the
    _sizes_exchange of ``send_sizes``) may be passed in when the caller
    already holds it, so back-to-back exchanges share ONE size collective."""
    out_shape = (E * cap,) + x.shape[1:]
    if _use_ragged():
        me = jax.lax.axis_index(axis)
        out_off = jnp.full((E,), me * cap, jnp.int32)
        if recv_sizes is None:
            recv_sizes = _sizes_exchange(send_sizes, axis)
        return _ragged_a2a(
            x,
            jnp.zeros(out_shape, x.dtype),
            in_off.astype(jnp.int32),
            send_sizes.astype(jnp.int32),
            out_off,
            recv_sizes.astype(jnp.int32),
            axis_name=axis,
        )
    # emulation: dense blocks of fixed capacity (same layout, full-capacity
    # transfers — test backends only)
    idx = in_off[:, None] + jnp.arange(cap)[None, :]  # [E, cap]
    blocks = jnp.take(x, jnp.clip(idx, 0, x.shape[0] - 1), axis=0)
    recv = jax.lax.all_to_all(blocks, axis, 0, 0)  # [E, cap, ...]
    return recv.reshape(out_shape)


def _exchange_from_blocks(blocks_flat, block_sizes, dest_off, out_len, axis,
                          E, cap, recv_sizes=None):
    """Reverse of :func:`_exchange_to_blocks`: send block j (valid prefix
    block_sizes[j], at offset j*cap) back to peer j, landing at dest_off[j] in
    the peer's compact [out_len, ...] buffer.  Receiver-side compact sizes are
    the receiver's original send_sizes (implied by its dest offsets) and may
    be passed as ``recv_sizes`` to skip the size collective."""
    out_shape = (out_len,) + blocks_flat.shape[1:]
    if _use_ragged():
        if recv_sizes is None:
            recv_sizes = _sizes_exchange(block_sizes, axis)
        return _ragged_a2a(
            blocks_flat,
            jnp.zeros(out_shape, blocks_flat.dtype),
            (jnp.arange(E, dtype=jnp.int32) * cap),
            block_sizes.astype(jnp.int32),
            dest_off.astype(jnp.int32),
            recv_sizes.astype(jnp.int32),
            axis_name=axis,
        )
    blocks = blocks_flat.reshape((E, cap) + blocks_flat.shape[1:])
    recv = jax.lax.all_to_all(blocks, axis, 0, 0)  # [E, cap, ...] from peer i
    # receiver-side compact reconstruction: position p came from the peer
    # whose [my_off[i], my_off[i]+my_sizes[i]) range contains p.
    my_off = _sizes_exchange(dest_off, axis)  # my_off[i] = dest_off_i[me]
    # my compact layout is contiguous blocks sorted by peer: recover per-
    # position source peer via searchsorted over block starts.
    order = jnp.argsort(my_off)
    starts = my_off[order]
    p = jnp.arange(out_len)
    which = jnp.clip(jnp.searchsorted(starts, p, side="right") - 1, 0, E - 1)
    src_peer = order[which]
    within = p - my_off[src_peer]
    within = jnp.clip(within, 0, cap - 1)
    return recv[src_peer, within]


def _dedup_route_layout(ids, E, S):
    """Sort + dedup a flat id vector and derive its per-owner contiguous
    send layout (owner = id // S is monotone in id, so sorting by id also
    groups by owner).  Shared by the a2a lookup forward and the sharded lazy
    row update — the exchange-layout conventions (padding id = E, compact
    unique prefix) must stay bit-identical between them.

    Returns (order, uniq_pos, uids, valid, send_sizes, in_off): ``order``
    sorts the occurrence stream, ``uniq_pos`` maps sorted positions to
    unique slots, ``uids`` holds the unique ids in its valid prefix."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
    )
    uniq_pos = jnp.cumsum(is_first) - 1  # sorted position -> unique slot
    n_uniq = uniq_pos[-1] + 1
    uids = jnp.zeros((n,), ids.dtype).at[uniq_pos].set(sids)
    valid = jnp.arange(n) < n_uniq
    owner = jnp.where(valid, uids // S, E)
    send_sizes = jnp.bincount(owner, length=E + 1)[:E].astype(jnp.int32)
    in_off = (jnp.cumsum(send_sizes) - send_sizes).astype(jnp.int32)
    return order, uniq_pos, uids, valid, send_sizes, in_off


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _a2a_lookup_local(table_shard, ids_local, embed_axis, E, data_axis,
                      width=None):
    out, _ = _a2a_fwd_core(table_shard, ids_local, embed_axis, E, width)
    return out


def _a2a_fwd_core(table_shard, ids_local, embed_axis, E, width=None):
    S = table_shard.shape[0]
    shape = ids_local.shape
    ids = ids_local.reshape(-1)
    n = ids.shape[0]
    me = jax.lax.axis_index(embed_axis)

    # 1-2. sort + dedup + per-owner contiguous send layout
    order, uniq_pos, uids, valid, send_sizes, in_off = _dedup_route_layout(
        ids, E, S
    )

    # 3. ids travel to their owners (block layout on the owner side)
    cap = n
    recv_sizes = _sizes_exchange(send_sizes, embed_axis)
    buf_ids = _exchange_to_blocks(
        uids, in_off, send_sizes, embed_axis, E, cap, recv_sizes=recv_sizes
    )

    # 4. owner gathers its rows (packed tables: only the first ``width``
    # param columns leave the shard — the state columns never ride ICI)
    local_idx = jnp.clip(buf_ids - me * S, 0, S - 1)
    rows_buf = jnp.take(table_shard, local_idx, axis=0)  # [E*cap, D]
    if width is not None:
        rows_buf = rows_buf[:, :width]

    # 5. rows travel back, landing compactly at the requester's unique slots
    # (optionally in a narrower wire dtype — halves ICI bytes at bf16)
    off_from = _sizes_exchange(in_off, embed_axis)  # where my block lands
    if _COMM_DTYPE is not None:
        rows_buf = rows_buf.astype(_COMM_DTYPE)
    # (the reverse direction's received sizes are my original send_sizes)
    urows = _exchange_from_blocks(
        rows_buf, recv_sizes, off_from, n, embed_axis, E, cap,
        recv_sizes=send_sizes,
    ).astype(table_shard.dtype)

    # 6. expand unique rows to every occurrence and unsort
    rows_sorted = jnp.take(urows, uniq_pos, axis=0)
    out = jnp.zeros_like(rows_sorted).at[order].set(rows_sorted)
    res = (order, uniq_pos, local_idx, recv_sizes, in_off, send_sizes,
           off_from, S, n, table_shard.shape[1])
    out_dim = table_shard.shape[1] if width is None else width
    return out.reshape(shape + (out_dim,)), res


def _a2a_fwd(table_shard, ids_local, embed_axis, E, data_axis, width=None):
    return _a2a_fwd_core(table_shard, ids_local, embed_axis, E, width)


def _a2a_bwd(embed_axis, E, data_axis, width, res, g):
    (order, uniq_pos, local_idx, recv_sizes, in_off, send_sizes, off_from,
     S, n, W) = res
    D = g.shape[-1]
    g = g.reshape(-1, D)
    cap = n
    # segment-sum duplicate cotangents into their unique slot
    g_sorted = jnp.take(g, order, axis=0)
    g_uniq = jnp.zeros((n, D), g.dtype).at[uniq_pos].add(g_sorted)
    # reverse route: unique cotangents travel to the owning shard
    if _COMM_DTYPE is not None:
        g_uniq = g_uniq.astype(_COMM_DTYPE)
    g_buf = _exchange_to_blocks(
        g_uniq, in_off, send_sizes, embed_axis, E, cap,
        recv_sizes=recv_sizes,
    ).astype(g.dtype)
    # mask block padding, scatter-add into the table shard's cotangent
    block_valid = (
        jnp.arange(cap)[None, :] < recv_sizes[:, None]
    ).reshape(-1)
    g_buf = jnp.where(block_valid[:, None], g_buf, 0.0)
    d_table = jnp.zeros((S, D), g.dtype).at[local_idx].add(g_buf)
    if D != W:
        # width-sliced (packed) lookup: the state columns saw no forward
        # read, so their cotangent is zero padding
        d_table = jnp.pad(d_table, ((0, 0), (0, W - D)))
    # the table is replicated over the data axis: its cotangent is the sum of
    # every data-group's contribution (also establishes the replication the
    # shard_map transpose requires)
    d_table = jax.lax.psum(d_table, data_axis)
    return (d_table, None)


_a2a_lookup_local.defvjp(_a2a_fwd, _a2a_bwd)


def sharded_lookup_a2a(table, ids, mesh: Mesh, data_axis="data",
                       embed_axis="embed", width=None):
    """table: [rows, dim] sharded P(embed, None); ids: int32 [B, ...] ->
    values [B, ..., dim].

    Unlike the psum kernel (which keeps ids replicated over ``embed`` and
    reduces full [B, F, D] blocks E times), the batch dim here shards over
    BOTH mesh axes for the exchange: each device requests rows only for its
    own [B/(dp·E), ...] sub-block from the owning shards in its ``embed``
    row, so each unique row crosses the interconnect exactly once in each
    direction and the output stays fully sharded (no replication anywhere).
    Downstream tower compute consumes the (data, embed)-sharded activations
    under GSPMD as plain full-batch data parallelism."""
    E = mesh.shape[embed_axis]
    both = (data_axis, embed_axis)
    ids_spec = P(both, *([None] * (ids.ndim - 1)))
    out_spec = P(both, *([None] * ids.ndim))
    return jax.shard_map(
        partial(_a2a_lookup_local, embed_axis=embed_axis, E=E,
                data_axis=data_axis, width=width),
        mesh=mesh,
        in_specs=(P(embed_axis, None), ids_spec),
        out_specs=out_spec,
    )(table, ids)


# --------------------------------------------------------------------------
# lazy (row-sparse) optimizer x row-sharded tables (SURVEY.md §7 M3)
# --------------------------------------------------------------------------


def sharded_lazy_row_update(table, state, ids, g_rows, step, row_update,
                            mesh: Mesh, lr, l1=0.0, l2=0.0,
                            data_axis="data", embed_axis="embed",
                            packed_dim=None, row_math=None,
                            state_mult=None, state_dtype=None):
    """Run a lazy row-sparse optimizer update on a row-sharded table.

    ``table``/``state``: [rows, *] sharded P(embed, None); ``ids``: [N] int32
    per-occurrence touched ids (data-sharded, duplicates allowed);
    ``g_rows``: [N, D] per-occurrence cotangents from the gradient-split
    engine.  Composition (the pod-capacity path — >100M-row tables train with
    per-shard state the dense optimizer cannot hold):

    1. each embed-row of devices all-gathers its data-peers' occurrence
       block, so every data replica of a shard sees identical inputs (the
       update must be bitwise identical across data replicas — the table is
       replicated over ``data``);
    2. sort + segment-sum the occurrences to unique (id, total-grad) pairs;
    3. the unique pairs travel to their owning shard over the ``embed`` axis
       via the same ragged exchange the all_to_all lookup uses — each unique
       row's gradient crosses the interconnect once;
    4. the owner merges blocks from its peers (the same id can arrive from
       several senders: re-sort + run-sum), adds the row-wise L2/L1
       regularization gradient ONCE per unique row, and applies the
       nonlinear row update (adam/adagrad) shard-locally.

    No full-table gradient, moment pass, or cross-shard table traffic ever
    materializes.  Returns (table_new, state_new), same shardings.

    Packed layout (``packed_dim=D`` + ``row_math``): ``table`` is the
    [rows, (1+k)*D] param|state array, ``state``/``row_update`` are unused
    (pass None) — the shard-local update gathers the packed rows ONCE,
    applies the pure row math, and writes ONE combined scatter.  Returns
    just the new packed table.
    """
    E = mesh.shape[embed_axis]

    def _merge_routed(ids_loc, g_loc, S, me):
        """Steps 1-4 shared by both layouts: all_gather the occurrence
        stream, dedup + route unique (id, grad-sum) pairs to their owning
        shard, merge per-peer blocks.  Returns (sl, g_runs): sorted local
        ids (padding id == S, dropped on write) and per-row gradient
        totals."""
        # 1. identical inputs across data replicas
        ids_all = jax.lax.all_gather(ids_loc, data_axis, tiled=True)
        g_all = jax.lax.all_gather(g_loc, data_axis, tiled=True)
        n = ids_all.shape[0]
        D = g_all.shape[1]
        # 2. dedup my slice of the occurrence stream + per-owner send layout
        #    (shared with the a2a lookup forward)
        order, uniq_pos, uids, valid, send_sizes, in_off = (
            _dedup_route_layout(ids_all, E, S)
        )
        g_sorted = jnp.take(g_all, order, axis=0)
        g_uniq = jnp.zeros((n, D), g_all.dtype).at[uniq_pos].add(g_sorted)
        # 3. route unique rows to their owners — one size collective feeds
        #    both block exchanges
        cap = n
        recv_sizes = _sizes_exchange(send_sizes, embed_axis)
        buf_ids = _exchange_to_blocks(
            uids, in_off, send_sizes, embed_axis, E, cap,
            recv_sizes=recv_sizes,
        )
        buf_g = _exchange_to_blocks(
            g_uniq, in_off, send_sizes, embed_axis, E, cap,
            recv_sizes=recv_sizes,
        )
        block_valid = (
            jnp.arange(cap)[None, :] < recv_sizes[:, None]
        ).reshape(-1)
        # 4. merge peer blocks: local index, padding -> S (drops on write)
        local_ids = jnp.where(block_valid, buf_ids - me * S, S)
        buf_g = jnp.where(block_valid[:, None], buf_g, 0.0)
        order2 = jnp.argsort(local_ids)
        sl = jnp.take(local_ids, order2)
        gl = jnp.take(buf_g, order2, axis=0)
        isf2 = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
        from ..optimizers import segment_run_sums

        return sl, segment_run_sums(gl, isf2)

    both = (data_axis, embed_axis)

    if packed_dim is not None:

        from ..optimizers import decode_state, encode_state

        k_d = (state_mult or 1) * packed_dim

        def _reg_on(v):
            # l1/l2 may be a scalar (single-table group) or a per-column
            # coefficient vector (multi-member group: members can carry
            # different reg weights) — callers pass a vector only when it
            # has nonzero entries
            return True if getattr(v, "ndim", 0) else float(v) > 0

        def local_packed(table_shard, ids_loc, g_loc):
            me = jax.lax.axis_index(embed_axis)
            S = table_shard.shape[0]
            sl, g_runs = _merge_routed(ids_loc, g_loc, S, me)
            # ONE packed gather serves the forward-value reg gradient AND
            # the optimizer state; ONE scatter writes both back
            rows = table_shard.at[sl].get(
                mode="clip", indices_are_sorted=True
            )
            p_rows = rows[:, :packed_dim]
            st_rows = decode_state(rows[:, packed_dim:], k_d, state_dtype)
            if _reg_on(l2):
                g_runs = g_runs + 2.0 * l2 * p_rows
            if _reg_on(l1):
                g_runs = g_runs + l1 * jnp.sign(p_rows)
            p_new, st_new = row_math(p_rows, st_rows, g_runs, step, lr=lr)
            return table_shard.at[sl].set(
                jnp.concatenate(
                    [p_new, encode_state(st_new, state_dtype)], axis=1
                ),
                unique_indices=True, mode="drop", indices_are_sorted=True,
            )

        return jax.shard_map(
            local_packed,
            mesh=mesh,
            in_specs=(P(embed_axis, None), P(both), P(both, None)),
            out_specs=P(embed_axis, None),
            check_vma=False,
        )(table, ids, g_rows)

    def local(table_shard, state_shard, ids_loc, g_loc):
        me = jax.lax.axis_index(embed_axis)
        S = table_shard.shape[0]
        sl, g_runs = _merge_routed(ids_loc, g_loc, S, me)
        # one row gather serves the reg gradient AND the update itself
        # (row_update skips its internal table walk when p_rows is given);
        # duplicate positions read the identical pre-update value, so
        # writes stay identical.  Padding slots (id == S) clip to row S-1
        # here but their table writes are dropped by the update.
        p_rows = table_shard.at[sl].get(
            mode="clip", indices_are_sorted=True
        )
        if l2 > 0:
            g_runs = g_runs + 2.0 * l2 * p_rows
        if l1 > 0:
            g_runs = g_runs + l1 * jnp.sign(p_rows)
        # 5. shard-local nonlinear row update
        p_new, s_new, _ = row_update(
            table_shard, state_shard, sl, g_runs, step, lr=lr,
            sorted_ids=True, p_rows=p_rows,
        )
        return p_new, s_new

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(embed_axis, None), P(embed_axis, None), P(both),
                  P(both, None)),
        out_specs=(P(embed_axis, None), P(embed_axis, None)),
        # outputs are bitwise identical across data replicas by construction
        # (step 1); the static replication checker can't see that
        check_vma=False,
    )(table, state, ids, g_rows)


def maybe_sharded_take(table, ids, width=None):
    """Dispatch used by EmbeddingCollection.lookup_ids: plain take under gspmd,
    the shard_map / all_to_all kernels when enabled.  ``width`` (packed
    tables) returns only the first ``width`` columns, sliced shard-side in
    the collective kernels so state columns never ride the interconnect."""
    if _MODE == "shard_map" and _MESH is not None:
        return sharded_lookup(table, ids, _MESH, width=width)
    if _MODE == "all_to_all" and _MESH is not None:
        return sharded_lookup_a2a(table, ids, _MESH, width=width)
    out = jnp.take(table, ids, axis=0)
    return out if width is None else out[..., :width]
