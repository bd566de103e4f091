"""DIN/DIEN behavior-sequence models + varlen pooling + GRU oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat
from xdeepfm_tpu.models import DIEN, DIN
from xdeepfm_tpu.nn.sequence import GRU, SequencePoolingLayer


def make_seq_data(n=256, vocab=12, maxlen=6, emb=4, with_neg=False, seed=0):
    rng = np.random.default_rng(seed)
    x = {
        "user": rng.integers(0, vocab, n),
        "item": rng.integers(0, vocab, n),
        "score": rng.uniform(0, 1, n).astype(np.float32),
    }
    lengths = rng.integers(1, maxlen + 1, n)
    hist = np.zeros((n, maxlen), np.int64)
    for i in range(n):
        hist[i, : lengths[i]] = rng.integers(1, vocab, lengths[i])
    x["hist_item"] = hist
    x["seq_length"] = lengths.astype(np.int64)
    if with_neg:
        neg = np.zeros((n, maxlen), np.int64)
        for i in range(n):
            neg[i, : lengths[i]] = rng.integers(1, vocab, lengths[i])
        x["neg_hist_item"] = neg
    y = (x["item"] % 2).astype(np.float32)

    item_feat = SparseFeat("item", vocab, embedding_dim=emb)
    cols = [
        SparseFeat("user", vocab, embedding_dim=emb),
        item_feat,
        DenseFeat("score", 1),
        VarLenSparseFeat(
            SparseFeat("hist_item", vocab, embedding_dim=emb, embedding_name="item"),
            maxlen=maxlen,
            length_name="seq_length",
        ),
    ]
    if with_neg:
        cols.append(
            VarLenSparseFeat(
                SparseFeat(
                    "neg_hist_item", vocab, embedding_dim=emb, embedding_name="item"
                ),
                maxlen=maxlen,
                length_name="seq_length",
            )
        )
    return x, y, cols


def test_din_trains():
    x, y, cols = make_seq_data()
    model = DIN(cols, ["item"], dnn_hidden_units=(16, 8), att_hidden_size=(8,))
    model.compile("adam", "binary_crossentropy", metrics=["auc"], lr=0.01)
    hist = model.fit(x, y, batch_size=64, epochs=4, verbose=0)
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    assert model.evaluate(x, y, 128)["auc"] > 0.7
    assert model.predict(x, 100).shape == (len(y), 1)


@pytest.mark.parametrize("gru_type", ["GRU", "AIGRU", "AGRU", "AUGRU"])
def test_dien_trains(gru_type):
    x, y, cols = make_seq_data(with_neg=True)
    model = DIEN(
        cols, ["item"], gru_type=gru_type, use_negsampling=True,
        dnn_hidden_units=(16, 8), att_hidden_units=(8,),
    )
    model.compile("adam", "binary_crossentropy", metrics=["auc"], lr=0.01)
    hist = model.fit(x, y, batch_size=64, epochs=4, verbose=0)
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    pred = model.predict(x, 64)
    assert pred.shape == (len(y), 1)
    assert np.all(np.isfinite(pred))


def test_gru_matches_torch_semantics(rng):
    """Our scan-GRU == torch GRU with packed sequences (incl. padded zeros)."""
    import torch

    B, T, H = 5, 4, 3
    x = rng.normal(size=(B, T, H)).astype(np.float32)
    lengths = np.array([4, 2, 1, 3, 4])
    gru = GRU(input_size=H, hidden_size=H, init_std=0.1)
    variables = gru.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    outs, h_last = gru.apply(variables, jnp.asarray(x), jnp.asarray(lengths))

    tg = torch.nn.GRU(H, H, batch_first=True)
    p = variables["params"]
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["weight_ih"])))
        tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["weight_hh"])))
        tg.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["bias_ih"])))
        tg.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["bias_hh"])))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
            enforce_sorted=False,
        )
        packed_out, _ = tg(packed)
        t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            packed_out, batch_first=True, padding_value=0.0, total_length=T
        )
    np.testing.assert_allclose(
        np.asarray(outs), t_out.numpy(), rtol=1e-4, atol=1e-5
    )


def test_sequence_pooling_modes(rng):
    B, T, E = 4, 5, 3
    seq = rng.normal(size=(B, T, E)).astype(np.float32)
    lengths = np.array([[5], [3], [1], [2]])
    for mode in ["sum", "mean", "max"]:
        layer = SequencePoolingLayer(mode=mode, supports_masking=False)
        out = layer.apply({}, (jnp.asarray(seq), jnp.asarray(lengths)))
        assert out.shape == (B, 1, E)
        # row 2 has length 1: pooled == first element (sum/mean/max agree)
        np.testing.assert_allclose(
            np.asarray(out)[2, 0], seq[2, 0], rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("gru_type", ["AGRU", "AUGRU"])
def test_dynamic_gru_matches_cell_loop(rng, gru_type):
    """DynamicGRU's transposed-lane scan == a Python loop over the reference
    batch-major cell __call__ (same params), incl. frozen state past length."""
    from xdeepfm_tpu.nn.sequence import AGRUCell, AUGRUCell, DynamicGRU

    B, T, H = 5, 6, 3
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    att = jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32))
    lengths = jnp.asarray(np.array([6, 2, 1, 4, 5]))

    dyn = DynamicGRU(input_size=H, hidden_size=H, gru_type=gru_type)
    variables = dyn.init(jax.random.PRNGKey(0), x, att, lengths)
    outs = dyn.apply(variables, x, att, lengths)

    cell_cls = AGRUCell if gru_type == "AGRU" else AUGRUCell
    cell = cell_cls(input_size=H, hidden_size=H)
    cell_vars = {"params": variables["params"]["rnn"]}
    h = jnp.zeros((B, H), jnp.float32)
    ref = []
    for t in range(T):
        h_new = cell.apply(cell_vars, x[:, t, :], h, att[:, t])
        valid = (t < lengths).astype(jnp.float32)[:, None]
        h = valid * h_new + (1 - valid) * h
        ref.append(h)
    ref = jnp.stack(ref, axis=1)
    np.testing.assert_allclose(
        np.asarray(outs), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_dien_evolution_init_std_parity():
    """The reference re-inits every interest_evolution WEIGHT to
    normal(0, init_std) (dien.py:315-318) -- AGRU/AUGRU cells included --
    while cell biases stay zero."""
    import jax
    import numpy as np

    x, y, cols = make_seq_data(with_neg=True)
    model = DIEN(cols, ["item"], gru_type="AUGRU", use_negsampling=True,
                 dnn_hidden_units=(16,))
    cells = [
        (jax.tree_util.keystr(path), np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(model.params)
        if "rnn" in jax.tree_util.keystr(path)
    ]
    assert cells, "no AUGRU cell params found"
    for name, w in cells:
        if "weight" in name:
            assert np.abs(w).max() < 0.01, (
                f"{name} should init at normal(init_std~1e-4), got "
                f"max {np.abs(w).max()}"
            )
        elif "bias" in name:
            np.testing.assert_array_equal(w, 0.0)
