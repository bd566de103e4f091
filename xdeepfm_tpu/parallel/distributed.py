"""Multi-host bootstrap + per-host input pipeline.

The reference's only parallelism is single-process DataParallel
(``basemodel.py:206-209``); there is no multi-host story at all.  Here:

* :func:`initialize` — ``jax.distributed`` bootstrap (coordinator discovery
  via env or args); no-op when single-process.
* :func:`global_batch_from_host_local` — assemble a globally-sharded batch
  from each host's local shard (the multi-host input pipeline primitive):
  every host loads only its ``1/num_processes`` slice of the batch and the
  resulting jax.Arrays are sharded over the ``data`` mesh axis with no
  cross-host data movement.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bootstrap jax.distributed for multi-host pods.  Arguments default to
    the standard env vars; single-process callers can skip entirely."""
    if num_processes is None:
        num_processes = int(os.environ.get("XDEEPFM_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("XDEEPFM_COORDINATOR", None),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("XDEEPFM_PROCESS_ID", "0")),
    )
    return True


def global_batch_from_host_local(
    local_batch: Dict[str, np.ndarray], mesh: Mesh, data_axis: str = "data"
):
    """Each process passes its host-local slice of the global batch; returns
    globally-sharded jax.Arrays (sharded over ``data_axis``).

    Uses ``jax.make_array_from_process_local_data`` so no host ever
    materializes the global batch.
    """
    out = {}
    for k, v in local_batch.items():
        spec = P(data_axis, *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
