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
