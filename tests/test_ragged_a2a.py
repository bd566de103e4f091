"""Execute the ragged all_to_all branch on the CPU mesh (VERDICT r4 #1).

``lax.ragged_all_to_all`` is unimplemented on XLA:CPU, so the pod-scale
exchange path in ``parallel/sharded_embedding.py`` normally runs only on
multi-chip TPU hardware.  These tests swap the primitive for a pure-JAX
emulation of its documented semantics (``parallel/ragged_emu.py``) and force
``ragged=True``, so the real argument plumbing — in_off/send_sizes/out_off/
recv_sizes on BOTH block exchanges, including the shared-size-collective
``recv_sizes=`` reuse — executes and must agree with the dense-emulation
branch and with un-sharded training.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xdeepfm_tpu.parallel import make_mesh, shard_batch, shard_model_state
from xdeepfm_tpu.parallel.ragged_emu import emulated_ragged_all_to_all
from xdeepfm_tpu.parallel.sharded_embedding import (
    set_embedding_mode,
    set_ragged_a2a_impl,
    sharded_lookup_a2a,
)


@pytest.fixture
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)  # (data=4, embed=2)


@pytest.fixture
def ragged_emulated():
    """Force the ragged branch, backed by the emulated primitive."""
    set_ragged_a2a_impl(emulated_ragged_all_to_all)
    try:
        yield
    finally:
        set_ragged_a2a_impl(None)
        set_embedding_mode("gspmd", None)
        from xdeepfm_tpu.parallel.mesh import set_active_mesh

        set_active_mesh(None)


def test_emulation_semantics_direct():
    """The emulation against a host-side reference of the primitive's spec:
    each device sends operand[in_off[j]: +send[j]] to peer j, landing at the
    sender's out_off[j] in peer j's result; untouched result rows keep the
    output operand's values."""
    E = 4
    devs = jax.devices()[:E]
    mesh = Mesh(np.array(devs), ("x",))
    n, out_len, D = 6, 8, 3
    rng = np.random.default_rng(0)
    operand = rng.normal(size=(E, n, D)).astype(np.float32)
    output = np.full((E, out_len, D), -7.0, np.float32)
    # device i sends 1 row to each peer j, from row j, landing at row i
    in_off = np.tile(np.arange(E, dtype=np.int32), (E, 1))
    send = np.ones((E, E), np.int32)
    out_off = np.tile(np.arange(E, dtype=np.int32)[:, None], (1, E))
    recv = np.ones((E, E), np.int32)

    expect = output.copy()
    for i in range(E):
        for j in range(E):
            s, o = send[i, j], out_off[i, j]
            expect[j, o : o + s] = operand[i, in_off[i, j] : in_off[i, j] + s]

    def local(op, out, io, ss, oo, rs):
        # shard_map keeps the leading (sharded) dim as size 1 — drop it
        return emulated_ragged_all_to_all(
            op[0], out[0], io[0], ss[0], oo[0], rs[0], axis_name="x"
        )[None]

    got = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("x"),) * 6,
            out_specs=P("x"),
        )
    )(operand, output, in_off, send, out_off, recv)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_emulation_poisons_bad_recv_sizes():
    """A recv_sizes vector that disagrees with the senders' true sizes must
    not pass silently — the emulation poisons the mismatched peer's rows."""
    E = 2
    mesh = Mesh(np.array(jax.devices()[:E]), ("x",))
    operand = np.arange(E * 4 * 2, dtype=np.float32).reshape(E, 4, 2)
    output = np.zeros((E, 8, 2), np.float32)
    in_off = np.zeros((E, E), np.int32)
    send = np.full((E, E), 2, np.int32)
    out_off = np.tile(np.arange(E, dtype=np.int32)[:, None] * 2, (1, E))
    bad_recv = np.full((E, E), 1, np.int32)  # senders actually send 2

    def local(op, out, io, ss, oo, rs):
        return emulated_ragged_all_to_all(
            op[0], out[0], io[0], ss[0], oo[0], rs[0], axis_name="x"
        )[None]

    got = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P("x"),) * 6, out_specs=P("x")
        )
    )(operand, output, in_off, send, out_off, bad_recv)
    assert np.isnan(np.asarray(got)).any()


def test_ragged_lookup_matches_replicated(mesh, ragged_emulated, rng):
    rows, dim = 64, 8
    table = rng.normal(size=(rows, dim)).astype(np.float32)
    # duplicate-heavy ids exercise the dedup + compact landing layout
    ids = rng.integers(0, 10, size=(16, 5)).astype(np.int32)
    expect = table[ids]
    table_d = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P("embed", None))
    )
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P("data", None))
    )
    set_embedding_mode("all_to_all", mesh, ragged=True)
    got = jax.jit(lambda t, i: sharded_lookup_a2a(t, i, mesh))(table_d, ids_d)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_ragged_lookup_skewed_distribution(mesh, ragged_emulated, rng):
    """All ids land on one owner shard (worst-case routing skew)."""
    rows, dim = 64, 4
    table = rng.normal(size=(rows, dim)).astype(np.float32)
    ids = rng.integers(rows - 8, rows, size=(16, 3)).astype(np.int32)
    table_d = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P("embed", None))
    )
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P("data", None))
    )
    set_embedding_mode("all_to_all", mesh, ragged=True)
    got = jax.jit(lambda t, i: sharded_lookup_a2a(t, i, mesh))(table_d, ids_d)
    np.testing.assert_allclose(np.asarray(got), table[ids], rtol=1e-6)


def test_ragged_lookup_grads_match_plain(mesh, ragged_emulated, rng):
    """The custom VJP's reverse exchange (cotangents route to owners) under
    the ragged branch == plain autodiff of a replicated take."""
    rows, dim = 32, 4
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 3, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 12, size=(8, 3)).astype(np.int32))

    def loss_plain(t):
        return jnp.sum(w * jnp.take(t, ids, axis=0) ** 2)

    g_plain = jax.grad(loss_plain)(table)

    table_d = jax.device_put(table, NamedSharding(mesh, P("embed", None)))
    ids_d = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    w_d = jax.device_put(w, NamedSharding(mesh, P("data", None, None)))
    set_embedding_mode("all_to_all", mesh, ragged=True)

    def loss_sharded(t):
        return jnp.sum(w_d * sharded_lookup_a2a(t, ids_d, mesh) ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(table_d)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )


def test_ragged_matches_dense_emulation_branch(mesh, rng):
    """Same lookup through the ragged branch (emulated primitive) and the
    dense-emulation branch must agree exactly — the two layouts are
    documented bit-compatible."""
    rows, dim = 64, 8
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, size=(16, 5)).astype(np.int32))
    table_d = jax.device_put(table, NamedSharding(mesh, P("embed", None)))
    ids_d = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    fn = jax.jit(lambda t, i: sharded_lookup_a2a(t, i, mesh))
    try:
        set_embedding_mode("all_to_all", mesh, ragged=False)
        dense = np.asarray(fn(table_d, ids_d))
        set_ragged_a2a_impl(emulated_ragged_all_to_all)
        set_embedding_mode("all_to_all", mesh, ragged=True)
        ragged = np.asarray(fn(table_d, ids_d))
    finally:
        set_ragged_a2a_impl(None)
        set_embedding_mode("gspmd", None)
    np.testing.assert_array_equal(ragged, dense)


def test_ragged_lookup_wide_embed_axis(ragged_emulated, rng):
    """E=4 owner shards (data=2): more peers per exchange — offsets and
    block layouts must still land exactly."""
    mesh = make_mesh(8, embed_axis=4)
    rows, dim = 64, 8
    table = rng.normal(size=(rows, dim)).astype(np.float32)
    ids = rng.integers(0, rows, size=(16, 5)).astype(np.int32)
    table_d = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P("embed", None))
    )
    ids_d = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P("data", None))
    )
    set_embedding_mode("all_to_all", mesh, ragged=True)
    got = jax.jit(lambda t, i: sharded_lookup_a2a(t, i, mesh))(table_d, ids_d)
    np.testing.assert_allclose(np.asarray(got), table[ids], rtol=1e-6)

    def loss(t):
        return jnp.sum(sharded_lookup_a2a(t, ids_d, mesh) ** 2)

    g = jax.jit(jax.grad(loss))(table_d)
    g_plain = jax.grad(
        lambda t: jnp.sum(jnp.take(t, jnp.asarray(ids), axis=0) ** 2)
    )(jnp.asarray(table))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )


def test_ragged_lazy_sharded_training_matches_single_device(ragged_emulated):
    """Full lazy+split sharded training with the ragged branch forced: the
    compact-row gathers AND sharded_lazy_row_update's two block exchanges
    (sharing one size collective via recv_sizes=) ride the emulated
    primitive; 2 steps must match un-sharded training."""
    from test_sharding import _tiny_lazy_model_and_batch

    model1, batch, y = _tiny_lazy_model_and_batch()
    yb = jnp.asarray(y[:, None])
    mask = jnp.ones((len(y),), jnp.float32)
    xb = {k: jnp.asarray(v) for k, v in batch.items()}
    p1, bs1, o1 = model1.params, model1.batch_stats, model1.opt_state
    for s in range(2):
        p1, bs1, o1, total1, _, _ = model1._train_step(
            p1, bs1, o1, xb, yb, mask, s
        )

    model2, batch2, y2 = _tiny_lazy_model_and_batch()
    mesh = make_mesh(8)
    with mesh:
        shard_model_state(model2, mesh)
        set_embedding_mode("all_to_all", mesh, ragged=True)
        xb2 = shard_batch(batch2, mesh)
        yb2 = jax.device_put(
            jnp.asarray(y2[:, None]), NamedSharding(mesh, P("data", None))
        )
        mask2 = jax.device_put(
            jnp.ones((len(y2),), jnp.float32), NamedSharding(mesh, P("data"))
        )
        p2, bs2, o2 = model2.params, model2.batch_stats, model2.opt_state
        for s in range(2):
            p2, bs2, o2, total2, _, _ = model2._train_step(
                p2, bs2, o2, xb2, yb2, mask2, s
            )
    np.testing.assert_allclose(float(total1), float(total2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
