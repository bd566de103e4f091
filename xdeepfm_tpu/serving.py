"""Serving / scoring path.

The reference's inference story is ``model.predict`` inside the training
process plus persisted ``preprocess.joblib`` + weights (``xdftrain.py:454-495``).
This module packages the same capability as a standalone scorer:

* :class:`Scorer` — fixed-shape jitted scoring function over a trained model
  (pad + slice, one compiled program, float64 outputs like ``predict``),
* :func:`load_scorer` — rebuild a scorer from CLI artifacts (weights +
  preprocess.pkl [+ native_vocab.bin]) without the training data.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Scorer:
    """Fixed-batch jitted scorer over a compiled/trained BaseModel."""

    def __init__(self, model, batch_size: int = 8192):
        self.model = model
        self.batch_size = batch_size
        module = model.module

        # read model.params/batch_stats LIVE at every call: weights loaded
        # or trained after Scorer construction must not be silently ignored
        if getattr(model, "_compiled", None):
            # the engine's jitted predict step includes the fused table
            # lookup (compile(fused_lookup=...)) — reuse it.
            self._fn = lambda batch: model._predict_step(
                model.params, model.batch_stats, batch
            )
        else:

            @jax.jit
            def score_fn(params, batch_stats, batch):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return module.apply(variables, batch, training=False)["pred"]

            self._fn = lambda batch: score_fn(
                model.params, model.batch_stats, batch
            )

    def warmup(self):
        # warm with the SAME batch pytree score() dispatches: schema.pack
        # output has no labels/sample_mask keys, and a different treedef
        # would compile a program the first real request never reuses
        dummy = self.model._dummy_batch(self.batch_size)
        dummy.pop("labels", None)
        dummy.pop("sample_mask", None)
        self._fn({k: jnp.asarray(v) for k, v in dummy.items()})
        return self

    def score(self, x: Dict[str, np.ndarray]) -> np.ndarray:
        batch = self.model._pack_x(x)
        n = len(next(iter(batch.values()), np.zeros((0,))))
        if n == 0:
            return np.zeros((0, 1), dtype="float64")
        out = []
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            xb = {k: v[start:stop] for k, v in batch.items()}
            bs = stop - start
            if bs < self.batch_size:
                xb = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], self.batch_size - bs, axis=0)]
                    )
                    for k, v in xb.items()
                }
            pred = self._fn({k: jnp.asarray(v) for k, v in xb.items()})
            out.append(np.asarray(pred)[:bs])
        return np.concatenate(out).astype("float64")


def load_scorer(
    build_model,
    weights_path: str,
    preprocess_path: Optional[str] = None,
    batch_size: int = 8192,
):
    """Rebuild a scorer from persisted artifacts.

    ``build_model()`` -> a compiled BaseModel with the right feature columns
    (the CLI's training_log.json records the config).  Returns
    (scorer, preprocess_dict | None).
    """
    model = build_model()
    model.load_weights(weights_path)
    preprocess = None
    if preprocess_path:
        with open(preprocess_path, "rb") as f:
            preprocess = pickle.load(f)
    return Scorer(model, batch_size=batch_size).warmup(), preprocess
