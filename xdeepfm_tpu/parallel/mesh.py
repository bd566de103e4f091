"""Device mesh + sharding layout.

TPU-native replacement for the reference's single-process
``torch.nn.DataParallel`` (``basemodel.py:206-209``, its only parallelism):

* ``data`` axis — batch (data parallelism); XLA inserts the psum gradient
  reduction over ICI, replacing DataParallel's scatter/gather.
* ``embed`` axis — embedding-table rows (model parallelism for the memory-
  dominant state the reference cannot shard at all; SURVEY.md §2h).  Stacked
  tables ``[rows, dim]`` shard on rows; GSPMD partitions the gather and its
  backward scatter-add across shards.

Everything else (CIN/DNN tower weights) replicates — they're tiny next to the
tables.  "Compute follows data": put params on device with these shardings,
jit the step with no explicit in_shardings, and XLA propagates.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]):
    """Record the mesh the model state was sharded over; ops (e.g. the Pallas
    CIN) consult this to wrap themselves in shard_map."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def make_mesh(n_devices: Optional[int] = None, embed_axis: Optional[int] = None):
    """Build a (data, embed) mesh over the first n devices.

    embed_axis defaults to 2 when device count is even (so row-sharding is
    exercised), else 1.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if embed_axis is None:
        embed_axis = 2 if n % 2 == 0 and n > 1 else 1
    assert n % embed_axis == 0
    dev_array = np.array(devices).reshape(n // embed_axis, embed_axis)
    return Mesh(dev_array, ("data", "embed"))


def param_sharding_rule(path_str: str, leaf, mesh: Mesh) -> NamedSharding:
    """Embedding tables row-shard over 'embed'; all else replicated."""
    embed_size = mesh.shape["embed"]
    if (
        "table_d" in path_str
        and leaf.ndim == 2
        and leaf.shape[0] % embed_size == 0
    ):
        return NamedSharding(mesh, P("embed", None))
    return NamedSharding(mesh, P())


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def shard_params(params, mesh: Mesh):
    """device_put a param pytree with the table-row-sharded layout."""

    def put(path, leaf):
        return jax.device_put(leaf, param_sharding_rule(_path_str(path), leaf, mesh))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_batch(batch: Dict, mesh: Mesh):
    """Shard every batch array over the 'data' axis (leading dim)."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }


def shard_model_state(model, mesh: Mesh):
    """Shard a compiled BaseModel's params in-place and rebuild the optimizer
    state on the sharded params (state inherits layout)."""
    model.params = shard_params(model.params, mesh)
    model.batch_stats = jax.device_put(
        model.batch_stats, NamedSharding(mesh, P())
    )
    # active mesh must be visible to _init_opt_state (the lazy-optimizer row
    # states shard with their tables, and the incremental reg tracker is
    # disabled for embed-sharded tables — see BaseModel._init_opt_state)
    set_active_mesh(mesh)
    model._init_opt_state()  # state inherits the sharded param layout
    return model
