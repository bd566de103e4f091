"""The CIN layer contraction — the framework's hottest op.

Reference math (``deepctr/layers/interaction.py:216-224``): per CIN layer,

    z[b, h, m, d] = x_k[b, h, d] * x_0[b, m, d]          (outer product)
    out[b, o, d]  = sum_{h,m} W[o, h*m] * z[b, h*m, d] + bias[o]
                                                          (1x1 Conv1d == matmul)

i.e. a 3-operand contraction ``einsum('bhd,bmd,ohm->bod')``.  The torch code
materializes the ``[B, H*M, D]`` intermediate in HBM; at B=4096, H=256, M=26,
D=10 that's ~1 GB of fp32 traffic per layer per direction.

Backends:
* ``"xla"``     — two-step einsum (correctness baseline; XLA chooses order).
* ``"fused"``   — reassociated contraction that keeps the intermediate small by
                  blocking over the embedding axis (still pure XLA).
* ``"pallas"``  — fused Pallas TPU kernel (see ``cin_pallas.py``): computes the
                  outer product tile-by-tile in VMEM and feeds the MXU matmul
                  without ever writing z to HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CIN_BACKEND = "auto"


def set_cin_backend(name: str) -> None:
    global _CIN_BACKEND
    assert name in ("auto", "xla", "fused", "pallas", "pallas_sm")
    _CIN_BACKEND = name


def _resolve_auto() -> str:
    # pallas on single-chip TPU (measured 3.1x fwd / 7.2x fwd+bwd vs the XLA
    # einsum on v5e, see bench).  On a multi-device mesh (set via
    # shard_model_state) the kernel wraps itself in shard_map over the data
    # axis ('pallas_sm'); plain GSPMD jit without a registered mesh falls back
    # to the XLA lowering (pallas_call is not GSPMD-partitionable).
    import jax

    try:
        if jax.default_backend() != "tpu":
            return "xla"
        if len(jax.devices()) == 1:
            return "pallas"
        from ..parallel.mesh import get_active_mesh

        return "pallas_sm" if get_active_mesh() is not None else "xla"
    except Exception:
        return "xla"


def get_cin_backend() -> str:
    return _CIN_BACKEND


def _cin_xla(h, x0, W, b):
    B, Hk, D = h.shape
    M = x0.shape[1]
    z = jnp.einsum("bhd,bmd->bhmd", h, x0).reshape(B, Hk * M, D)
    out = jnp.einsum("oc,bcd->bod", W, z)
    return out + b[None, :, None]


def _cin_fused(h, x0, W, b):
    # Reassociate: out[b,o,d] = sum_h x_k[b,h,d] * (sum_m W[o,h,m] * x0[b,m,d])
    # With W reshaped [O, H, M]: t[b,o,h,d] = einsum('ohm,bmd->bohd') then
    # contract h. XLA fuses the two dots; intermediate is [B,O,H,D] — same
    # asymptotic size, but batched-matmul shaped so Mosaic tiles it better for
    # small D. For the real win use the pallas backend.
    O = W.shape[0]
    Hk = h.shape[1]
    M = x0.shape[1]
    W3 = W.reshape(O, Hk, M)
    t = jnp.einsum("ohm,bmd->bohd", W3, x0, preferred_element_type=jnp.float32)
    out = jnp.einsum("bhd,bohd->bod", h, t, preferred_element_type=jnp.float32)
    return out + b[None, :, None]


def cin_rows_contract(h_rows, x0_rows, W, b, backend: str | None = None):
    """Row-major CIN layer: rows are (b, d) slices.

    h_rows [N, H], x0_rows [N, M], W [O, H*M], b [O] -> [N, O].  Keeping the
    CIN stack in row form between layers avoids per-layer [B,F,D] <-> [N,F]
    relayouts (the embedding axis D is tiny, so the row count N = B*D).
    """
    be = backend or _CIN_BACKEND
    if be == "auto":
        be = _resolve_auto()
    if be == "pallas":
        from .cin_pallas import cin_pallas_rows

        return cin_pallas_rows(h_rows, x0_rows, W, b)
    if be == "pallas_sm":
        # shard_map over the data axis: rows are (b, d) slices so a batch
        # sharded over 'data' shards rows contiguously; each device runs the
        # fused kernel on its local rows, weights replicated.
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import get_active_mesh
        from .cin_pallas import cin_pallas_rows

        mesh = get_active_mesh()
        return jax.shard_map(
            cin_pallas_rows,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P(None, None), P(None)),
            out_specs=P("data", None),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )(h_rows, x0_rows, W, b)
    # XLA lowering: z[n, h*M+m] = h[n,h] * x0[n,m]; out = z @ W^T + b
    H = h_rows.shape[1]
    M = x0_rows.shape[1]
    z = (h_rows[:, :, None] * x0_rows[:, None, :]).reshape(
        h_rows.shape[0], H * M
    )
    return z @ W.T + b[None, :]


def cin_layer_contract(h, x0, W, b, backend: str | None = None):
    """One CIN layer: ``einsum('bhd,bmd,ohm->bod') + bias``.

    h: [B, H_k, D] current feature maps; x0: [B, M, D] layer-0 embeddings;
    W: [O, H_k*M] compression kernel; b: [O].
    """
    be = backend or _CIN_BACKEND
    if be == "auto":
        be = _resolve_auto()
    if be == "xla":
        return _cin_xla(h, x0, W, b)
    if be == "fused":
        return _cin_fused(h, x0, W, b)
    if be == "pallas":
        from .cin_pallas import cin_pallas

        return cin_pallas(h, x0, W, b)
    raise ValueError(be)
