"""Full checkpoint/resume: params + optimizer state round-trip."""

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import DeepFM


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    n = 256
    x = {f"C{i}": rng.integers(0, 16, n) for i in range(3)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", 16, 4) for i in range(3)] + [DenseFeat("I0")]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
    m.compile("adam", "binary_crossentropy", metrics=[])
    return m, x, y


def test_resume_matches_uninterrupted(tmp_path):
    # uninterrupted: 4 epochs
    m1, x, y = _setup()
    m1.fit(x, y, batch_size=64, epochs=4, verbose=0, shuffle=False)
    p_full = m1.predict(x, 64)

    # interrupted: 2 epochs, checkpoint, fresh model, resume 2 more
    m2, x, y = _setup()
    m2.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    ckpt = str(tmp_path / "ckpt.bin")
    m2.save_checkpoint(ckpt, epoch=2)

    m3, x, y = _setup()
    start = m3.load_checkpoint(ckpt)
    assert start == 2
    m3.fit(
        x, y, batch_size=64, epochs=4, initial_epoch=start, verbose=0,
        shuffle=False,
    )
    p_resumed = m3.predict(x, 64)

    # Adam moments restored -> trajectories coincide (up to rng stream of
    # dropout, which is off here; shuffle off for identical batch order).
    np.testing.assert_allclose(p_resumed, p_full, rtol=1e-4, atol=1e-6)


def test_weights_only_roundtrip(tmp_path):
    m, x, y = _setup()
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    p1 = m.predict(x, 64)
    path = str(tmp_path / "w.bin")
    m.save_weights(path)
    m2, _, _ = _setup(seed=9)
    m2.load_weights(path)
    np.testing.assert_allclose(m2.predict(x, 64), p1, rtol=1e-6)


def test_model_checkpoint_default_saves_full_and_load_weights_tolerant(tmp_path):
    """ModelCheckpoint's default (save_weights_only=False) writes a FULL
    checkpoint (the reference torch.saves the whole model); load_weights
    still extracts weights from such a file."""
    from xdeepfm_tpu.callbacks import ModelCheckpoint

    m, x, y = _setup()
    path = str(tmp_path / "full.ckpt")
    m.fit(x, y, batch_size=64, epochs=1, verbose=0,
          callbacks=[ModelCheckpoint(filepath=path)])
    p1 = m.predict(x, 64)
    # full-resume consumer
    m2, _, _ = _setup(seed=9)
    m2.load_checkpoint(path)
    np.testing.assert_allclose(m2.predict(x, 64), p1, rtol=1e-6)
    # weights-only consumer of the same file
    m3, _, _ = _setup(seed=11)
    m3.load_weights(path)
    np.testing.assert_allclose(m3.predict(x, 64), p1, rtol=1e-6)


def test_callbacks_receive_params():
    """fit() propagates set_params through CallbackList (keras contract)."""
    from xdeepfm_tpu.callbacks import Callback

    class Probe(Callback):
        def on_train_begin(self, logs=None):
            assert self.params is not None
            assert self.params["epochs"] == 1
            self.saw = self.params

    m, x, y = _setup()
    probe = Probe()
    m.fit(x, y, batch_size=64, epochs=1, verbose=0, callbacks=[probe])
    assert probe.saw["steps"] == 4


def test_sharded_checkpoint_roundtrip_single_device(tmp_path):
    """save_checkpoint_sharded / load_checkpoint_sharded (orbax, per-shard
    writes): resume parity on one device, incl. the packed lazy layout
    (the LIVE representation round-trips)."""
    m1, x, y = _setup()
    m1.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    ckpt = str(tmp_path / "ock")
    m1.save_checkpoint_sharded(ckpt, epoch=2)

    m2, x, y = _setup()
    assert m2.load_checkpoint_sharded(ckpt) == 2
    np.testing.assert_allclose(m2.predict(x, 64), m1.predict(x, 64),
                               rtol=1e-6)
    m1.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    m2.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    np.testing.assert_allclose(m2.predict(x, 64), m1.predict(x, 64),
                               rtol=1e-6)

    # packed lazy layout saves/restores its live param|state arrays
    def lazy_setup():
        rng = np.random.default_rng(0)
        n = 256
        lx = {f"C{i}": rng.integers(0, 16, n) for i in range(3)}
        lx["I0"] = rng.uniform(0, 1, n).astype(np.float32)
        ly = (lx["C0"] % 2).astype(np.float32)
        cols = [SparseFeat(f"C{i}", 16, 4) for i in range(3)] + [
            DenseFeat("I0")
        ]
        lm = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
        lm.compile("adam", "binary_crossentropy", metrics=[],
                   embedding_optimizer="lazy", embedding_gradient="split")
        return lm, lx, ly

    l1, lx, ly = lazy_setup()
    l1.fit(lx, ly, batch_size=64, epochs=1, verbose=0, shuffle=False)
    lckpt = str(tmp_path / "ock_lazy")
    l1.save_checkpoint_sharded(lckpt, epoch=1)
    l2, lx, ly = lazy_setup()
    assert l2.load_checkpoint_sharded(lckpt) == 1
    np.testing.assert_array_equal(
        np.asarray(l2.params["embedding_dict"]["table_d4"]),
        np.asarray(l1.params["embedding_dict"]["table_d4"]),
    )


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path):
    """On the 8-device mesh: each table shard writes from its own devices
    and restores DIRECTLY into P('embed', None) — no host gather in either
    direction.  Restored model == saved model, sharding preserved, resumed
    step parity."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xdeepfm_tpu.parallel import make_mesh, shard_batch, shard_model_state
    from xdeepfm_tpu.parallel.mesh import set_active_mesh

    def setup_sharded(mesh):
        m, x, y = _setup()
        shard_model_state(m, mesh)
        return m, x, y

    mesh = make_mesh(8)
    try:
        with mesh:
            m1, x, y = setup_sharded(mesh)
            xb = shard_batch(m1.schema.pack(x), mesh)
            yb = jax.device_put(
                jnp.asarray(np.asarray(y, np.float32)[:, None]),
                NamedSharding(mesh, P("data", None)),
            )
            mask = jax.device_put(
                jnp.ones((len(y),), jnp.float32),
                NamedSharding(mesh, P("data")),
            )
            (m1.params, m1.batch_stats, m1.opt_state, t1, _, _) = (
                m1._train_step(
                    m1.params, m1.batch_stats, m1.opt_state, xb, yb, mask, 0
                )
            )
            ckpt = str(tmp_path / "ock_mesh")
            m1.save_checkpoint_sharded(ckpt, epoch=1)

            m2, _, _ = setup_sharded(mesh)
            assert m2.load_checkpoint_sharded(ckpt) == 1
            table = m2.params["embedding_dict"]["table_d4"]
            assert table.sharding.spec == P("embed", None), table.sharding
            for a, b in zip(
                jax.tree_util.tree_leaves(m1.params),
                jax.tree_util.tree_leaves(m2.params),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # resumed sharded step parity
            (_, _, _, t1b, _, _) = m1._train_step(
                m1.params, m1.batch_stats, m1.opt_state, xb, yb, mask, 1
            )
            (_, _, _, t2b, _, _) = m2._train_step(
                m2.params, m2.batch_stats, m2.opt_state, xb, yb, mask, 1
            )
            np.testing.assert_allclose(float(t1b), float(t2b), rtol=1e-6)
    finally:
        set_active_mesh(None)


def test_sharded_checkpoint_async_overlaps_training(tmp_path):
    """save_checkpoint_sharded(block=False): the snapshot is consistent at
    save time even though training keeps mutating the live arrays before
    the write completes."""
    m1, x, y = _setup()
    m1.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    snap_pred = m1.predict(x, 64)
    ckpt = str(tmp_path / "ock_async")
    m1.save_checkpoint_sharded(ckpt, epoch=1, block=False)
    # keep training while tensorstore writes in the background
    m1.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    m1.wait_for_checkpoints()

    m2, x, y = _setup()
    assert m2.load_checkpoint_sharded(ckpt) == 1
    np.testing.assert_allclose(m2.predict(x, 64), snap_pred, rtol=1e-6)
