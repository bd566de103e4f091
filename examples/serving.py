"""Standalone serving: train, persist weights, rebuild a scorer WITHOUT the
training data, and score new traffic.

The reference's inference story is ``model.predict`` inside the training
process plus persisted preprocessors + weights (``xdftrain.py:454-495``);
here the same capability ships as ``serving.Scorer`` / ``load_scorer`` — a
fixed-shape jitted scoring function (pad + slice, one compiled program)
reusing the engine's fused-lookup predict step.

    python examples/serving.py
"""

import os
import tempfile

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import xDeepFM
from xdeepfm_tpu.serving import load_scorer

VOCAB = 1000


def build_model():
    """The serving side rebuilds the model from config alone (the CLIs
    record theirs in training_log.json)."""
    cols = [
        SparseFeat(f"C{i}", vocabulary_size=VOCAB, embedding_dim=8)
        for i in range(8)
    ] + [DenseFeat(f"I{i}", 1) for i in range(4)]
    model = xDeepFM(
        cols, cols, cin_layer_size=(32, 16), dnn_hidden_units=(64, 32)
    )
    model.compile("adam", "binary_crossentropy", metrics=["auc"])
    return model


def make_traffic(n, seed):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, VOCAB, n) for i in range(8)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, n).astype(np.float32) for i in range(4)}
    )
    logit = (x["C0"] % 5 < 2) * 1.2 + x["I0"] * 1.5 - 1.5
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
    return x, y


def main():
    # --- training process -------------------------------------------------
    x, y = make_traffic(20000, seed=0)
    model = build_model()
    model.fit(x, y, batch_size=1024, epochs=2, verbose=2)
    weights = os.path.join(tempfile.mkdtemp(), "xdeepfm.weights.npz")
    model.save_weights(weights)
    print("saved", weights)

    # --- serving process (no training data in sight) ----------------------
    scorer, _ = load_scorer(build_model, weights, batch_size=4096)
    traffic, labels = make_traffic(10000, seed=7)
    preds = scorer.score(traffic)
    # sanity: the scorer reproduces the training process's predict exactly
    ref = model.predict(traffic, batch_size=4096)
    print("serving preds", preds[:5].ravel())
    print("max |serving - train predict| =", float(np.abs(preds - ref).max()))


if __name__ == "__main__":
    main()
