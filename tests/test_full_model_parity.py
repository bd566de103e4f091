"""FULL-MODEL parity vs the torch reference: copy every weight and require
identical predictions (xDeepFM) and identical TRAINING-TIME total-loss
scalars (DIEN's BCE + negative-sampling auxiliary loss, xDeepFMPro's
BCE + sfg_weight * SFG reconstruction loss) — the places where a subtle
masking or normalization bug would hide while AUC still looked fine."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")


def test_xdeepfm_forward_parity(rng):
    from deepctr.inputs import DenseFeat as TDense, SparseFeat as TSparse
    from deepctr.models.xdeepfm import xDeepFM as TorchXDeepFM

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import xDeepFM

    n_sparse, n_dense, vocab, emb = 5, 3, 12, 4
    B = 16
    cin_size = (8, 6)
    dnn_units = (10, 8)

    t_cols = [
        TSparse(f"C{i}", vocabulary_size=vocab, embedding_dim=emb)
        for i in range(n_sparse)
    ] + [TDense(f"I{i}", 1) for i in range(n_dense)]
    t_model = TorchXDeepFM(
        t_cols, t_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size,
        dnn_dropout=0, device="cpu",
    )
    t_model.eval()

    j_cols = [
        SparseFeat(f"C{i}", vocab, embedding_dim=emb) for i in range(n_sparse)
    ] + [DenseFeat(f"I{i}", 1) for i in range(n_dense)]
    j_model = xDeepFM(
        j_cols, j_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size
    )
    j_model.compile("adam", "binary_crossentropy", metrics=[])

    # ---- copy weights torch -> jax ----------------------------------------
    def tnp(t):
        return t.detach().numpy()

    import flax

    p = flax.core.unfreeze(j_model.params)

    # dnn embedding tables: stacked [n_sparse*vocab, emb] in feature order
    stacked = np.concatenate(
        [tnp(t_model.embedding_dict[f"C{i}"].weight) for i in range(n_sparse)]
    )
    p["embedding_dict"]["table_d4"] = jnp.asarray(stacked)
    # linear 1-dim tables + dense weight
    lin_stacked = np.concatenate(
        [
            tnp(t_model.linear_model.embedding_dict[f"C{i}"].weight)
            for i in range(n_sparse)
        ]
    )
    p["linear_model"]["embedding_dict"]["table_d1"] = jnp.asarray(lin_stacked)
    p["linear_model"]["weight"] = jnp.asarray(tnp(t_model.linear_model.weight))
    # CIN conv kernels
    for i in range(len(cin_size)):
        p["cin"][f"conv_w_{i}"] = jnp.asarray(
            tnp(t_model.cin.conv1ds[i].weight)[:, :, 0]
        )
        p["cin"][f"conv_b_{i}"] = jnp.asarray(tnp(t_model.cin.conv1ds[i].bias))
    p["cin_linear"]["kernel"] = jnp.asarray(tnp(t_model.cin_linear.weight).T)
    # DNN
    for i in range(len(dnn_units)):
        p["dnn"][f"linear_{i}"]["kernel"] = jnp.asarray(
            tnp(t_model.dnn.linears[i].weight).T
        )
        p["dnn"][f"linear_{i}"]["bias"] = jnp.asarray(
            tnp(t_model.dnn.linears[i].bias)
        )
    p["dnn_linear"]["kernel"] = jnp.asarray(tnp(t_model.dnn_linear.weight).T)
    p["out"]["global_bias"] = jnp.asarray(tnp(t_model.out.bias))
    j_model.params = p

    # ---- identical inputs --------------------------------------------------
    ids = rng.integers(0, vocab, size=(B, n_sparse)).astype(np.float32)
    dense = rng.uniform(0, 1, size=(B, n_dense)).astype(np.float32)
    X = np.concatenate([ids, dense], axis=1)  # reference layout: C then I
    with torch.no_grad():
        t_pred = t_model(torch.from_numpy(X)).numpy()

    x = {f"C{i}": ids[:, i].astype(np.int64) for i in range(n_sparse)}
    x.update({f"I{i}": dense[:, i] for i in range(n_dense)})
    j_pred = j_model.predict(x, batch_size=B)

    np.testing.assert_allclose(j_pred, t_pred, rtol=1e-4, atol=1e-5)


def test_dien_training_loss_parity(rng):
    """Copy torch DIEN (AUGRU + negsampling) weights and require the total
    training loss — sum-BCE + alpha*auxiliary loss (reference
    ``deepctr/models/dien.py:181-274``) — to match on one batch."""
    import torch.nn.functional as F
    import flax
    from deepctr.inputs import (
        DenseFeat as TD,
        SparseFeat as TS,
        VarLenSparseFeat as TV,
        build_input_features,
    )
    from deepctr.models.dien import DIEN as TorchDIEN

    from xdeepfm_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat
    from xdeepfm_tpu.models import DIEN

    vocab, emb, maxlen, B = 12, 4, 6, 16

    t_cols = [
        TS("user", vocabulary_size=vocab, embedding_dim=emb),
        TS("item", vocabulary_size=vocab, embedding_dim=emb),
        TD("score", 1),
        TV(TS("hist_item", vocabulary_size=vocab, embedding_dim=emb,
              embedding_name="item"), maxlen=maxlen, length_name="seq_length"),
        TV(TS("neg_hist_item", vocabulary_size=vocab, embedding_dim=emb,
              embedding_name="item"), maxlen=maxlen, length_name="seq_length"),
    ]
    t = TorchDIEN(
        t_cols, ["item"], gru_type="AUGRU", use_negsampling=True, alpha=0.5,
        dnn_hidden_units=(16, 8), att_hidden_units=(8,),
        att_activation="sigmoid", l2_reg_embedding=0, l2_reg_dnn=0,
        dnn_dropout=0, device="cpu",
    )
    t.eval()
    torch.manual_seed(3)
    with torch.no_grad():
        for p_ in t.parameters():
            p_.data.normal_(0, 0.1)

    j_cols = [
        SparseFeat("user", vocab, embedding_dim=emb),
        SparseFeat("item", vocab, embedding_dim=emb),
        DenseFeat("score", 1),
        VarLenSparseFeat(
            SparseFeat("hist_item", vocab, embedding_dim=emb,
                       embedding_name="item"),
            maxlen=maxlen, length_name="seq_length",
        ),
        VarLenSparseFeat(
            SparseFeat("neg_hist_item", vocab, embedding_dim=emb,
                       embedding_name="item"),
            maxlen=maxlen, length_name="seq_length",
        ),
    ]
    j = DIEN(
        j_cols, ["item"], gru_type="AUGRU", use_negsampling=True, alpha=0.5,
        dnn_hidden_units=(16, 8), att_hidden_units=(8,),
        att_activation="sigmoid", l2_reg_embedding=0, l2_reg_dnn=0,
        dnn_dropout=0,
    )
    j.compile("adam", "binary_crossentropy", metrics=[])

    def tnp(x):
        return x.detach().numpy()

    p = flax.core.unfreeze(j.params)
    # stacked embedding table: [user; item] (first-occurrence order)
    p["embedding_dict"]["table_d4"] = jnp.asarray(
        np.concatenate([tnp(t.embedding_dict["user"].weight),
                        tnp(t.embedding_dict["item"].weight)])
    )
    ie = p["interest_extractor"]
    ie["gru"]["weight_ih"] = jnp.asarray(tnp(t.interest_extractor.gru.weight_ih_l0))
    ie["gru"]["weight_hh"] = jnp.asarray(tnp(t.interest_extractor.gru.weight_hh_l0))
    ie["gru"]["bias_ih"] = jnp.asarray(tnp(t.interest_extractor.gru.bias_ih_l0))
    ie["gru"]["bias_hh"] = jnp.asarray(tnp(t.interest_extractor.gru.bias_hh_l0))
    for i in range(3):
        lin = t.interest_extractor.auxiliary_net.linears[i]
        ie["auxiliary_net"][f"linear_{i}"]["kernel"] = jnp.asarray(tnp(lin.weight).T)
        ie["auxiliary_net"][f"linear_{i}"]["bias"] = jnp.asarray(tnp(lin.bias))
    ev = p["interest_evolution"]
    la = t.interest_evolution.attention.local_att
    ev["attention"]["local_att"]["dnn"]["linear_0"]["kernel"] = jnp.asarray(
        tnp(la.dnn.linears[0].weight).T)
    ev["attention"]["local_att"]["dnn"]["linear_0"]["bias"] = jnp.asarray(
        tnp(la.dnn.linears[0].bias))
    ev["attention"]["local_att"]["dense"]["kernel"] = jnp.asarray(tnp(la.dense.weight).T)
    ev["attention"]["local_att"]["dense"]["bias"] = jnp.asarray(tnp(la.dense.bias))
    cell = t.interest_evolution.interest_evolution.rnn
    ev["interest_evolution"]["rnn"]["weight_ih"] = jnp.asarray(tnp(cell.weight_ih))
    ev["interest_evolution"]["rnn"]["weight_hh"] = jnp.asarray(tnp(cell.weight_hh))
    # reference AUGRUCell registration quirk (sequence.py:256-262): the
    # second register_parameter('bias_ih', self.bias_hh) makes BOTH gate
    # paths read one shared tensor — copying the attributes reproduces it
    assert np.allclose(tnp(cell.bias_ih), tnp(cell.bias_hh))
    ev["interest_evolution"]["rnn"]["bias_ih"] = jnp.asarray(tnp(cell.bias_ih))
    ev["interest_evolution"]["rnn"]["bias_hh"] = jnp.asarray(tnp(cell.bias_hh))
    for i in range(2):
        p["dnn"][f"linear_{i}"]["kernel"] = jnp.asarray(tnp(t.dnn.linears[i].weight).T)
        p["dnn"][f"linear_{i}"]["bias"] = jnp.asarray(tnp(t.dnn.linears[i].bias))
    p["linear"]["kernel"] = jnp.asarray(tnp(t.linear.weight).T)
    p["out"]["global_bias"] = jnp.asarray(tnp(t.out.bias))
    j.params = p

    # data: all lengths >= 1, incl. one length-1 row (dropped from the aux
    # loss on both sides: its click/noclick sub-sequence is empty)
    lengths = rng.integers(2, maxlen + 1, B)
    lengths[0] = 1
    hist = np.zeros((B, maxlen), np.int64)
    neg = np.zeros((B, maxlen), np.int64)
    for i in range(B):
        hist[i, : lengths[i]] = rng.integers(1, vocab, lengths[i])
        neg[i, : lengths[i]] = rng.integers(1, vocab, lengths[i])
    x = {
        "user": rng.integers(0, vocab, B),
        "item": rng.integers(1, vocab, B),
        "score": rng.uniform(0, 1, B).astype(np.float32),
        "hist_item": hist,
        "seq_length": lengths.astype(np.int64),
        "neg_hist_item": neg,
    }
    y = rng.integers(0, 2, B).astype(np.float32)

    fi = build_input_features(t_cols)
    X = np.concatenate(
        [np.asarray(x[n]).reshape(B, e - s).astype(np.float32)
         for n, (s, e) in fi.items()], axis=1,
    )
    with torch.no_grad():
        t_pred = t(torch.from_numpy(X)).numpy().reshape(-1)
    t_aux = float(t.aux_loss.detach())  # already alpha-weighted
    t_bce = float(F.binary_cross_entropy(
        torch.from_numpy(t_pred), torch.from_numpy(y), reduction="sum"))

    batch = {k: jnp.asarray(v) for k, v in j._pack_x(x).items()}
    out = j.module.apply({"params": j.params}, batch, training=False)
    j_pred = np.asarray(out["pred"]).reshape(-1)
    j_aux = float(out["aux_loss"])
    eps = 1e-12
    j_bce = float(np.sum(-(y * np.log(j_pred + eps)
                           + (1 - y) * np.log(1 - j_pred + eps))))

    np.testing.assert_allclose(j_pred, t_pred, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_aux, t_aux, rtol=1e-4)
    np.testing.assert_allclose(j_bce + j_aux, t_bce + t_aux, rtol=1e-4)


def test_sfg_training_loss_parity(rng):
    """Copy torch xDeepFMPro weights (SFG decoder + label-aware attention)
    and require the total training loss — sum-BCE + sfg_weight*sfg_loss
    (reference ``deepctr/xdeepfm_pro/basemodel_sfg.py:344,420-476``) — to
    match on one batch."""
    import torch.nn.functional as F
    import flax
    from deepctr.inputs import (
        DenseFeat as TD,
        SparseFeat as TS,
        build_input_features,
    )
    from deepctr.xdeepfm_pro import xDeepFMPro as TorchPro

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.pro import xDeepFMPro

    vocab, emb, B = 12, 4, 32
    ns, nd = 5, 3
    cin_size, dnn_units, sfg_units = (8, 6), (16, 8), (16, 8)
    SW = 0.3

    t_cols = [TS(f"C{i}", vocabulary_size=vocab, embedding_dim=emb)
              for i in range(ns)] + [TD(f"I{i}", 1) for i in range(nd)]
    t = TorchPro(
        t_cols, t_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size,
        l2_reg_linear=0, l2_reg_embedding=0, dnn_dropout=0,
        use_sfg=True, sfg_weight=SW, sfg_hidden_units=sfg_units,
        sfg_dropout=0, sfg_positive_only=True, sfg_use_label_attention=True,
        use_autodis=False, device="cpu",
    )
    torch.manual_seed(5)
    with torch.no_grad():
        for p_ in t.parameters():
            p_.data.normal_(0, 0.1)

    j_cols = [SparseFeat(f"C{i}", vocab, embedding_dim=emb)
              for i in range(ns)] + [DenseFeat(f"I{i}", 1) for i in range(nd)]
    j = xDeepFMPro(
        j_cols, j_cols, dnn_hidden_units=dnn_units, cin_layer_size=cin_size,
        l2_reg_linear=0, l2_reg_embedding=0, dnn_dropout=0,
        use_sfg=True, sfg_weight=SW, sfg_hidden_units=sfg_units,
        sfg_dropout=0, sfg_positive_only=True, sfg_use_label_attention=True,
        use_autodis=False,
    )
    j.compile("adam", "binary_crossentropy", metrics=[])

    def tnp(x):
        return x.detach().numpy()

    p = flax.core.unfreeze(j.params)
    p["embedding_dict"]["table_d4"] = jnp.asarray(np.concatenate(
        [tnp(t.embedding_dict[f"C{i}"].weight) for i in range(ns)]))
    p["linear_model"]["embedding_dict"]["table_d1"] = jnp.asarray(np.concatenate(
        [tnp(t.linear_model.embedding_dict[f"C{i}"].weight) for i in range(ns)]))
    p["linear_model"]["weight"] = jnp.asarray(tnp(t.linear_model.weight))
    for i in range(len(cin_size)):
        p["cin"][f"conv_w_{i}"] = jnp.asarray(tnp(t.cin.conv1ds[i].weight)[:, :, 0])
        p["cin"][f"conv_b_{i}"] = jnp.asarray(tnp(t.cin.conv1ds[i].bias))
    p["cin_linear"]["kernel"] = jnp.asarray(tnp(t.cin_linear.weight).T)
    for i in range(len(dnn_units)):
        p["dnn"][f"linear_{i}"]["kernel"] = jnp.asarray(tnp(t.dnn.linears[i].weight).T)
        p["dnn"][f"linear_{i}"]["bias"] = jnp.asarray(tnp(t.dnn.linears[i].bias))
    p["dnn_linear"]["kernel"] = jnp.asarray(tnp(t.dnn_linear.weight).T)
    p["out"]["global_bias"] = jnp.asarray(tnp(t.out.bias))
    sd, tsd = p["sfg_decoder"], t.sfg_decoder
    for i in range(len(sfg_units)):
        # torch Sequential: (Linear, ReLU, Dropout) triplets
        lin = tsd.shared_layers[3 * i]
        sd[f"shared_{i}"]["kernel"] = jnp.asarray(tnp(lin.weight).T)
        sd[f"shared_{i}"]["bias"] = jnp.asarray(tnp(lin.bias))
    for i in range(ns):
        head = tsd.sparse_heads[f"C{i}"]
        sd[f"head_C{i}"]["kernel"] = jnp.asarray(tnp(head.weight).T)
        sd[f"head_C{i}"]["bias"] = jnp.asarray(tnp(head.bias))
    sd["dense_head"]["kernel"] = jnp.asarray(tnp(tsd.dense_head.weight).T)
    sd["dense_head"]["bias"] = jnp.asarray(tnp(tsd.dense_head.bias))
    la, tla = sd["label_attention"], tsd.label_attention
    la["label_embedding"] = jnp.asarray(tnp(tla.label_embedding.weight))
    la["att1"]["kernel"] = jnp.asarray(tnp(tla.attention_net[0].weight).T)
    la["att1"]["bias"] = jnp.asarray(tnp(tla.attention_net[0].bias))
    la["att2"]["kernel"] = jnp.asarray(tnp(tla.attention_net[2].weight).T)
    la["att2"]["bias"] = jnp.asarray(tnp(tla.attention_net[2].bias))
    j.params = p

    x = {f"C{i}": rng.integers(0, vocab, B) for i in range(ns)}
    x.update({f"I{i}": rng.uniform(0, 1, B).astype(np.float32)
              for i in range(nd)})
    y = rng.integers(0, 2, B).astype(np.float32)

    fi = build_input_features(t_cols)
    X = np.concatenate(
        [np.asarray(x[n]).reshape(B, e - s).astype(np.float32)
         for n, (s, e) in fi.items()], axis=1,
    )
    t.train()  # sfg loss only computed in training mode (all dropouts 0)
    y_pred_t, sfg_info = t.forward_with_sfg(
        torch.from_numpy(X), torch.from_numpy(y))
    t_pred = y_pred_t.detach().numpy().reshape(-1)
    t_sfg = float(sfg_info["sfg_loss"].detach())
    t_bce = float(F.binary_cross_entropy(
        torch.from_numpy(t_pred), torch.from_numpy(y), reduction="sum"))

    batch = {k: jnp.asarray(v) for k, v in j._pack_x(x).items()}
    batch["labels"] = jnp.asarray(y[:, None])
    out = j.module.apply(
        {"params": j.params}, batch, training=True,
        rngs={"dropout": __import__("jax").random.PRNGKey(0)},
    )
    j_pred = np.asarray(out["pred"]).reshape(-1)
    j_sfg = float(out["logs"]["sfg_loss"])
    j_aux = float(out["aux_loss"])  # = SW * sfg_loss
    eps = 1e-12
    j_bce = float(np.sum(-(y * np.log(j_pred + eps)
                           + (1 - y) * np.log(1 - j_pred + eps))))

    np.testing.assert_allclose(j_pred, t_pred, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j_sfg, t_sfg, rtol=1e-4)
    np.testing.assert_allclose(j_bce + j_aux, t_bce + SW * t_sfg, rtol=1e-4)
