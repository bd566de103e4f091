"""Lazy (row-sparse) embedding optimizer: touched-row semantics + learning."""

import numpy as np
import jax

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import DeepFM, xDeepFM


def _data(n=256, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(4)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, 8) for i in range(4)] + [DenseFeat("I0")]
    return x, y, cols


def test_lazy_only_touches_seen_rows():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    assert m._lazy_tables, "lazy specs should exist"
    before = np.asarray(m.params["embedding_dict"]["table_d8"]).copy()
    # batch touching only ids {0, 1} of each feature
    xb = {f"C{i}": np.array([0, 1, 0, 1]) for i in range(4)}
    xb["I0"] = np.zeros(4, np.float32)
    yb = np.array([0, 1, 0, 1], np.float32)
    m.fit(xb, yb, batch_size=4, epochs=1, verbose=0, shuffle=False)
    after = np.asarray(m.params["embedding_dict"]["table_d8"])
    vocab = 64
    for feat_idx in range(4):
        off = feat_idx * vocab
        touched = after[off : off + 2]
        untouched = after[off + 2 : off + vocab]
        assert not np.allclose(touched, before[off : off + 2])
        np.testing.assert_array_equal(untouched, before[off + 2 : off + vocab])


def test_lazy_learns_comparably():
    x, y, cols = _data()
    res = {}
    for mode in ("dense", "lazy"):
        m = xDeepFM(
            cols, cols, dnn_hidden_units=(16,), cin_layer_size=(8,), seed=7
        )
        m.compile("adam", "binary_crossentropy", metrics=["auc"],
                  embedding_optimizer=mode)
        m.fit(x, y, batch_size=64, epochs=6, verbose=0)
        res[mode] = m.evaluate(x, y, 128)["auc"]
    assert res["lazy"] > 0.9, res
    assert abs(res["lazy"] - res["dense"]) < 0.05, res


def test_lazy_adagrad():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adagrad", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    h = m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_lazy_checkpoint_roundtrip(tmp_path):
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    p = str(tmp_path / "c.bin")
    m.save_checkpoint(p, epoch=1)
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m2.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy")
    assert m2.load_checkpoint(p) == 1
    np.testing.assert_allclose(m2.predict(x, 128), m.predict(x, 128), rtol=1e-6)
