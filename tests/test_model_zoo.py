"""Every zoo model trains end-to-end on a tiny synthetic task and its loss
decreases (reference has no tests; SURVEY.md §4 strategy)."""

import numpy as np
import pytest

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu import models as M


def make_data(n=256, n_sparse=4, n_dense=2, vocab=8, emb_dim=4, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, size=n).astype(np.int64) for i in range(n_sparse)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, size=n).astype(np.float32) for i in range(n_dense)}
    )
    logits = (x["C0"] % 2) * 2.0 + x["I0"] * 2 - 2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=emb_dim) for i in range(n_sparse)] + [
        DenseFeat(f"I{i}", 1) for i in range(n_dense)
    ]
    return x, y, cols


MODEL_BUILDERS = {
    "DeepFM": lambda c: M.DeepFM(c, c, dnn_hidden_units=(8, 8)),
    "WDL": lambda c: M.WDL(c, c, dnn_hidden_units=(8, 8)),
    "NFM": lambda c: M.NFM(c, c, dnn_hidden_units=(8, 8), bi_dropout=0.2),
    # AFM/CCPM forbid dense feats in dnn columns (support_dense=False,
    # basemodel.py:364-366) — sparse-only dnn columns, like the reference.
    "AFM_att": lambda c: M.AFM(
        c, [f for f in c if isinstance(f, SparseFeat)],
        use_attention=True, attention_factor=4,
    ),
    "AFM_plain": lambda c: M.AFM(
        c, [f for f in c if isinstance(f, SparseFeat)], use_attention=False
    ),
    "AFN": lambda c: M.AFN(c, c, ltl_hidden_size=8, afn_dnn_hidden_units=(8, 8)),
    "AutoInt": lambda c: M.AutoInt(c, c, att_layer_num=2, dnn_hidden_units=(8, 8)),
    "DCN_vec": lambda c: M.DCN(c, c, cross_num=2, dnn_hidden_units=(8, 8)),
    "DCN_mat": lambda c: M.DCN(
        c, c, cross_num=2, cross_parameterization="matrix", dnn_hidden_units=(8,)
    ),
    "DCNMix": lambda c: M.DCNMix(
        c, c, cross_num=2, dnn_hidden_units=(8,), low_rank=4, num_experts=2
    ),
    "FiBiNET": lambda c: M.FiBiNET(c, c, dnn_hidden_units=(8, 8)),
    "IFM": lambda c: M.IFM(c, c, dnn_hidden_units=(8, 8)),
    "DIFM": lambda c: M.DIFM(c, c, att_head_num=2, dnn_hidden_units=(8, 8)),
    "ONN": lambda c: M.ONN(c, c, dnn_hidden_units=(8, 8)),
    "PNN_inner": lambda c: M.PNN(c, dnn_hidden_units=(8, 8), use_inner=True),
    "PNN_outer": lambda c: M.PNN(
        c, dnn_hidden_units=(8, 8), use_inner=False, use_outter=True
    ),
    "CCPM": lambda c: M.CCPM(
        c, [f for f in c if isinstance(f, SparseFeat)],
        conv_kernel_width=(3, 2), conv_filters=(2, 2), dnn_hidden_units=(8,),
    ),
    "MLR": lambda c: M.MLR(c, region_num=3),
    "xDeepFM": lambda c: M.xDeepFM(c, c, dnn_hidden_units=(8,), cin_layer_size=(4, 4)),
}


@pytest.mark.parametrize("name", sorted(MODEL_BUILDERS))
def test_model_trains(name):
    x, y, cols = make_data()
    model = MODEL_BUILDERS[name](cols)
    model.compile("adam", "binary_crossentropy", metrics=["auc"])
    hist = model.fit(x, y, batch_size=64, epochs=3, verbose=0)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0], f"{name}: loss did not decrease: {losses}"
    pred = model.predict(x, batch_size=100)
    assert pred.shape == (len(y), 1)
    assert np.all(np.isfinite(pred))
    if name != "MLR":  # MLR returns raw combined score (reference mlr.py:96-99)
        assert np.all(pred >= 0) and np.all(pred <= 1)
