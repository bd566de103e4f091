"""Quickstart: train xDeepFM on a synthetic Criteo-shaped task.

    python examples/quickstart.py          # runs on the available backend
"""

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat, get_feature_names
from xdeepfm_tpu.models import xDeepFM


def main():
    rng = np.random.default_rng(0)
    n, vocab = 20000, 1000

    # feature columns: 26 categorical + 13 dense, like Criteo
    cols = [
        SparseFeat(f"C{i}", vocabulary_size=vocab, embedding_dim=10)
        for i in range(1, 27)
    ] + [DenseFeat(f"I{i}", 1) for i in range(1, 14)]

    # synthetic data with real signal
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(1, 27)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, n).astype(np.float32) for i in range(1, 14)}
    )
    logit = (x["C1"] % 7 < 3) * 1.5 + x["I1"] * 2 - 2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    model = xDeepFM(
        cols, cols, cin_layer_size=(256, 128), dnn_hidden_units=(256, 256),
        dnn_dropout=0.1,
    )
    model.compile(
        "adam", "binary_crossentropy",
        metrics=["binary_crossentropy", "auc"], lr=1e-3,
    )
    model.fit(
        x, y, batch_size=1024, epochs=3, verbose=2, validation_split=0.1,
        steps_per_dispatch=4,
    )
    print("eval:", model.evaluate(x, y, batch_size=4096))
    pred = model.predict(x, batch_size=4096)
    print("predictions:", pred[:5].ravel())


if __name__ == "__main__":
    main()
