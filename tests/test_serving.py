"""Serving scorer == model.predict; artifact round-trip."""

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import DeepFM
from xdeepfm_tpu.serving import Scorer, load_scorer


def _make():
    rng = np.random.default_rng(0)
    n = 300
    x = {"C0": rng.integers(0, 16, n), "I0": rng.uniform(0, 1, n).astype(np.float32)}
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat("C0", 16, 4), DenseFeat("I0")]

    def build():
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=4)
        m.compile("adam", "binary_crossentropy", metrics=[])
        return m

    return build, x, y


def test_scorer_matches_predict(tmp_path):
    build, x, y = _make()
    m = build()
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    expect = m.predict(x, 128)
    scorer = Scorer(m, batch_size=128)
    got = scorer.score(x)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_load_scorer_roundtrip(tmp_path):
    build, x, y = _make()
    m = build()
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    wpath = str(tmp_path / "w.bin")
    m.save_weights(wpath)
    expect = m.predict(x, 128)
    scorer, _ = load_scorer(build, wpath, batch_size=128)
    np.testing.assert_allclose(scorer.score(x), expect, rtol=1e-6)
