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

Two modes:
* ``gspmd`` (default): plain ``jnp.take`` on a row-sharded table; XLA GSPMD
  partitions the gather itself.  Always correct, good baseline.
* ``shard_map``: the explicit kernel above — deterministic collective schedule,
  the layout the Pallas all-to-all path will slot into.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MODE = "gspmd"
_MESH: Optional[Mesh] = None


def set_embedding_mode(mode: str, mesh: Optional[Mesh] = None):
    """mode in {'gspmd', 'shard_map'}; shard_map requires a mesh with
    ('data', 'embed') axes."""
    global _MODE, _MESH
    assert mode in ("gspmd", "shard_map")
    _MODE = mode
    _MESH = mesh


def get_embedding_mode():
    return _MODE, _MESH


def sharded_lookup(table, ids, mesh: Mesh, data_axis="data", embed_axis="embed"):
    """table: [rows, dim] sharded P(embed, None); ids: int32 [...] sharded
    P(data, ...) -> values [..., dim] sharded P(data, ...).

    rows must divide evenly by the embed-axis size (pad tables when stacking).
    """

    def local_lookup(table_shard, ids_local):
        e = jax.lax.axis_index(embed_axis)
        S = table_shard.shape[0]
        local = ids_local - e * S
        in_range = (local >= 0) & (local < S)
        safe = jnp.clip(local, 0, S - 1)
        vals = jnp.take(table_shard, safe, axis=0)
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


def maybe_sharded_take(table, ids):
    """Dispatch used by EmbeddingCollection.lookup_ids: plain take under gspmd,
    the shard_map kernel when enabled."""
    if _MODE == "shard_map" and _MESH is not None:
        return sharded_lookup(table, ids, _MESH)
    return jnp.take(table, ids, axis=0)
