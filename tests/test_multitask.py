"""Multitask fit path (loss list, [B, T] outputs) + attention-CIN variants."""

import numpy as np
import pytest

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu import models as M


def make_data(n=256, n_sparse=4, n_dense=2, vocab=8, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, size=n).astype(np.int64) for i in range(n_sparse)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, size=n).astype(np.float32) for i in range(n_dense)}
    )
    y1 = (x["C0"] % 2).astype(np.float32)
    y2 = y1 * (rng.uniform(size=n) < 0.7)
    y = np.stack([y1, y2.astype(np.float32)], axis=1)
    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=4) for i in range(n_sparse)] + [
        DenseFeat(f"I{i}", 1) for i in range(n_dense)
    ]
    return x, y, cols


MT_BUILDERS = {
    "SharedBottom": lambda c: M.SharedBottom(
        c, bottom_dnn_hidden_units=(8, 8), tower_dnn_hidden_units=(4,)
    ),
    "ESMM": lambda c: M.ESMM(c, tower_dnn_hidden_units=(8, 8)),
    "MMOE": lambda c: M.MMOE(
        c, num_experts=2, expert_dnn_hidden_units=(8,), gate_dnn_hidden_units=(4,),
        tower_dnn_hidden_units=(4,),
    ),
    "PLE": lambda c: M.PLE(
        c, num_levels=2, expert_dnn_hidden_units=(8,), gate_dnn_hidden_units=(4,),
        tower_dnn_hidden_units=(4,),
    ),
}


@pytest.mark.parametrize("name", sorted(MT_BUILDERS))
def test_multitask_trains(name):
    x, y, cols = make_data()
    model = MT_BUILDERS[name](cols)
    model.compile(
        "adam", ["binary_crossentropy", "binary_crossentropy"], metrics=["auc"],
        lr=0.01,
    )
    hist = model.fit(x, y, batch_size=64, epochs=8, verbose=0)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0], f"{name}: loss did not decrease: {losses}"
    pred = model.predict(x, batch_size=100)
    assert pred.shape == (len(y), 2)
    assert np.all((pred >= 0) & (pred <= 1))
    res = model.evaluate(x, y, batch_size=128)
    assert res["auc"] > 0.52  # macro-average over the two tasks


def test_multitask_with_lazy_packed_embeddings():
    """Loss-list multitask step composed with the lazy+split packed-table
    optimizer (per-task sum-BCE grads flow into one occurrence block)."""
    x, y, cols = make_data()
    model = M.MMOE(
        cols, num_experts=2, expert_dnn_hidden_units=(8,),
        gate_dnn_hidden_units=(4,), tower_dnn_hidden_units=(4,),
    )
    model.compile(
        "adam", ["binary_crossentropy", "binary_crossentropy"], metrics=[],
        lr=0.01, embedding_optimizer="lazy", embedding_gradient="split",
    )
    assert model._packed_tables, "packed layout expected"
    hist = model.fit(x, y, batch_size=64, epochs=6, verbose=0)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0]
    pred = model.predict(x, batch_size=100)
    assert pred.shape == (len(y), 2)
    assert np.all(np.isfinite(pred))


@pytest.mark.parametrize("version", [1, 2])
def test_xdeepfm_attention(version):
    x, y, cols = make_data()
    y = y[:, 0]
    cls = M.xDeepFMAttention if version == 1 else M.xDeepFMAttentionV2
    model = cls(
        cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4, 4),
        cin_num_heads=2,
    )
    model.compile("adam", "binary_crossentropy", metrics=["auc"])
    hist = model.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    pred = model.predict(x, batch_size=64)
    assert pred.shape == (len(y), 1)


def test_attention_head_shrink():
    from xdeepfm_tpu.nn.cin_attention import get_valid_num_heads

    assert get_valid_num_heads(10, 4) == 2  # 4 -> 3 -> 2 divides 10
    assert get_valid_num_heads(8, 4) == 4
    assert get_valid_num_heads(7, 4) == 1
