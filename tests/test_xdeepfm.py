"""End-to-end: xDeepFM on a tiny synthetic Criteo-like task (SURVEY.md §4)."""

import numpy as np
import pytest

from xdeepfm_tpu.features import DenseFeat, SparseFeat, get_feature_names
from xdeepfm_tpu.models import xDeepFM


def make_data(n=512, n_sparse=4, n_dense=3, vocab=10, seed=0):
    rng = np.random.default_rng(seed)
    x = {}
    for i in range(n_sparse):
        x[f"C{i}"] = rng.integers(0, vocab, size=n).astype(np.int64)
    for i in range(n_dense):
        x[f"I{i}"] = rng.uniform(0, 1, size=n).astype(np.float32)
    # label depends on C0 and I0 so the model has signal to learn
    logits = (x["C0"] % 2).astype(np.float32) * 2.0 + x["I0"] * 2.0 - 2.0
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=4) for i in range(n_sparse)] + [
        DenseFeat(f"I{i}", 1) for i in range(n_dense)
    ]
    return x, y, cols


@pytest.fixture(scope="module")
def model_and_data():
    x, y, cols = make_data()
    model = xDeepFM(
        cols, cols, dnn_hidden_units=(16, 16), cin_layer_size=(8, 6), seed=1024
    )
    model.compile("adam", "binary_crossentropy", metrics=["binary_crossentropy", "auc"])
    return model, x, y


def test_fit_learns(model_and_data):
    model, x, y = model_and_data
    hist = model.fit(x, y, batch_size=128, epochs=8, verbose=0, validation_split=0.25)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert hist.history["val_auc"][-1] > 0.6


def test_predict_shapes(model_and_data):
    model, x, y = model_and_data
    pred = model.predict(x, batch_size=100)  # non-divisible batch
    assert pred.shape == (len(y), 1)
    assert pred.dtype == np.float64
    assert np.all(pred >= 0) and np.all(pred <= 1)


def test_evaluate_keys(model_and_data):
    model, x, y = model_and_data
    res = model.evaluate(x, y, batch_size=256)
    assert set(res.keys()) == {"binary_crossentropy", "auc"}
    assert res["auc"] > 0.55


def test_save_load_roundtrip(tmp_path, model_and_data):
    model, x, y = model_and_data
    p1 = model.predict(x, batch_size=256)
    path = str(tmp_path / "w.bin")
    model.save_weights(path)
    w = model.get_weights()
    # perturb then restore
    w2 = {k: v for k, v in w.items()}
    model.load_weights(path)
    p2 = model.predict(x, batch_size=256)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_feature_names_order():
    _, _, cols = make_data(n=4)
    names = get_feature_names(cols)
    assert names == [f"C{i}" for i in range(4)] + [f"I{i}" for i in range(3)]


def test_deterministic_seed():
    x, y, cols = make_data(n=128)
    preds = []
    for _ in range(2):
        m = xDeepFM(cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4,), seed=7)
        m.compile("adam", "binary_crossentropy", metrics=[])
        m.fit(x, y, batch_size=64, epochs=1, verbose=0)
        preds.append(m.predict(x, batch_size=64))
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-6)
