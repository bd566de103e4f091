"""steps_per_dispatch (lax.scan over K train steps) must be bit-equivalent to
single-step dispatch."""

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import DeepFM


def test_multi_dispatch_parity():
    rng = np.random.default_rng(0)
    n = 500
    x = {f"C{i}": rng.integers(0, 30, n) for i in range(4)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", 30, 4) for i in range(4)] + [DenseFeat("I0")]
    runs = []
    for spd in (1, 4):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=3)
        m.compile("adam", "binary_crossentropy", metrics=["auc"])
        h = m.fit(
            x, y, batch_size=64, epochs=2, verbose=2, shuffle=False,
            steps_per_dispatch=spd,
        )
        runs.append((h, m.predict(x, 128)))
    (h1, p1), (h2, p2) = runs
    np.testing.assert_allclose(h1.history["loss"], h2.history["loss"], rtol=1e-5)
    np.testing.assert_allclose(h1.history["auc"], h2.history["auc"], rtol=1e-4)
    np.testing.assert_allclose(p1, p2, rtol=1e-5)
