"""Pure-JAX emulation of ``lax.ragged_all_to_all`` for CPU test meshes.

The primitive is unimplemented on XLA:CPU, which would leave the pod-scale
ragged exchange in ``sharded_embedding.py`` (the designated TPU transfer
path) inspection-verified only — a wrong offset there would corrupt
embeddings silently on a real pod.  This module implements the primitive's
documented semantics out of dense collectives so CPU-mesh tests can force
``ragged=True`` and execute the REAL argument plumbing
(`in_off`/`send_sizes`/`out_off`/`recv_sizes`) end to end:

for each device ``i`` and peer ``j``:

* ``operand[input_offsets[j] : input_offsets[j] + send_sizes[j]]`` on
  device ``i`` is sent to device ``j``;
* it lands in device ``j``'s result starting at row ``output_offsets[j]``
  (the SENDER-side value names the offset in the receiver's buffer);
* the result starts as a copy of ``output`` — rows outside every received
  segment keep ``output``'s values;
* ``recv_sizes[j]`` on the receiver mirrors the sender's ``send_sizes``
  entry.  The emulation exchanges the senders' TRUE sizes and compares them
  against the caller's ``recv_sizes``; a mismatched peer's received rows are
  poisoned (NaN / huge int) so a plumbing bug in EITHER vector shows up as
  a parity failure instead of passing silently.

Capacity note: per-peer chunks are padded to ``operand.shape[0]`` rows and
swapped with a dense ``all_to_all`` — O(E·n) wire bytes instead of the
primitive's O(n), fine for tests.

Usage (see ``tests/test_ragged_a2a.py``)::

    set_ragged_a2a_impl(emulated_ragged_all_to_all)
    set_embedding_mode("all_to_all", mesh, ragged=True)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def emulated_ragged_all_to_all(operand, output, input_offsets, send_sizes,
                               output_offsets, recv_sizes, *, axis_name):
    E = jax.lax.axis_size(axis_name)
    n = operand.shape[0]
    cap = n  # every valid chunk fits: offsets/sizes address operand rows
    trail = operand.shape[1:]

    # 1. per-peer fixed-capacity chunks of my operand (zero-padded tail so a
    #    chunk starting near the end still has cap rows to slice)
    src = jnp.concatenate(
        [operand, jnp.zeros((cap,) + trail, operand.dtype)], axis=0
    )
    chunks = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(
                src, input_offsets[j].astype(jnp.int32), cap, axis=0
            )
            for j in range(E)
        ]
    )  # [E, cap, ...]

    # 2. swap chunks; exchange the sender-side landing offsets and true sizes
    #    (element j of a per-peer vector travels to peer j)
    def swap_vec(v):
        return jax.lax.all_to_all(
            v.astype(jnp.int32)[:, None], axis_name, 0, 0
        ).reshape(-1)

    recv_chunks = jax.lax.all_to_all(chunks, axis_name, 0, 0)  # [E, cap, ...]
    my_off = swap_vec(output_offsets)  # where peer j's chunk lands in MY out
    my_sz = swap_vec(send_sizes)      # how many of its rows are real
    # validate the caller's recv_sizes against the senders' truth (poison on
    # mismatch — see docstring)
    size_ok = my_sz == recv_sizes.astype(jnp.int32)
    if jnp.issubdtype(operand.dtype, jnp.floating):
        poison = jnp.array(jnp.nan, operand.dtype)
    else:
        poison = jnp.array(jnp.iinfo(operand.dtype).max // 2, operand.dtype)

    # 3. write each received chunk's valid prefix at its landing offset
    out_len = output.shape[0]
    out = jnp.concatenate(
        [output, jnp.zeros((cap,) + trail, output.dtype)], axis=0
    )
    rows = jnp.arange(cap).reshape((cap,) + (1,) * len(trail))
    for j in range(E):
        cur = jax.lax.dynamic_slice_in_dim(out, my_off[j], cap, axis=0)
        got = jnp.where(size_ok[j], recv_chunks[j], poison)
        new = jnp.where(rows < my_sz[j], got, cur)
        out = jax.lax.dynamic_update_slice_in_dim(out, new, my_off[j], axis=0)
    return out[:out_len]
