"""xDeepFM-Pro: SFG loss, AutoDis, label-aware attention, diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.pro import xDeepFMPro, xDeepFMProLight
from xdeepfm_tpu.pro.autodis import AutoDisLayer
from xdeepfm_tpu.pro.sfg import sfg_loss


def make_data(n=256, n_sparse=4, n_dense=3, vocab=8, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, size=n).astype(np.int64) for i in range(n_sparse)}
    x.update(
        {f"I{i}": rng.uniform(0, 1, size=n).astype(np.float32) for i in range(n_dense)}
    )
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=4) for i in range(n_sparse)] + [
        DenseFeat(f"I{i}", 1) for i in range(n_dense)
    ]
    return x, y, cols


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(use_sfg=True, sfg_positive_only=True, sfg_use_label_attention=True),
        dict(use_sfg=True, sfg_positive_only=False, sfg_use_label_attention=False),
        dict(use_sfg=False),
        dict(use_sfg=True, use_autodis=True, autodis_buckets=4),
        dict(use_sfg=True, sfg_fused_ce=True),  # large-vocab remat'd CE path
    ],
)
def test_pro_trains(kwargs):
    x, y, cols = make_data()
    model = xDeepFMPro(
        cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4, 4),
        sfg_hidden_units=(8, 4), **kwargs,
    )
    model.compile("adam", "binary_crossentropy", metrics=["auc"])
    hist = model.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    if kwargs.get("use_sfg"):
        assert "sfg_loss" in hist.history, hist.history.keys()
        assert np.isfinite(hist.history["sfg_loss"]).all()
    pred = model.predict(x, 100)
    assert pred.shape == (len(y), 1)


def test_pro_light_defaults():
    x, y, cols = make_data(n=128)
    model = xDeepFMProLight(cols, cols, cin_layer_size=(4,), dnn_hidden_units=(8,))
    assert model.sfg_weight == 0.05
    model.compile("adam", "binary_crossentropy", metrics=[])
    model.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_embedding_analysis():
    x, y, cols = make_data(n=64)
    model = xDeepFMPro(cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4,))
    model.compile("adam", "binary_crossentropy", metrics=[])
    stats = model.get_embedding_analysis({k: v[:32] for k, v in x.items()})
    assert stats["num_fields"] == 4
    assert stats["embedding_dim"] == 4
    assert np.isfinite(stats["embedding_variance"])
    assert -1.0 <= stats["avg_sample_cosine_similarity"] <= 1.0


def test_sfg_loss_positive_masking():
    rng = np.random.default_rng(0)
    B, V, D = 8, 5, 3
    logits = {"C0": jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))}
    targets = {"C0": jnp.asarray(rng.integers(0, V, B))}
    dense_p = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    dense_t = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    labels_all_neg = jnp.zeros((B, 1))
    loss_neg = sfg_loss(
        logits, dense_p, targets, dense_t, labels_all_neg, positive_only=True
    )
    # no positives -> ~0 loss (normalized by eps guard)
    assert float(loss_neg) < 1e-3
    labels_pos = jnp.ones((B, 1))
    loss_pos = sfg_loss(
        logits, dense_p, targets, dense_t, labels_pos, positive_only=True
    )
    loss_all = sfg_loss(
        logits, dense_p, targets, dense_t, labels_pos, positive_only=False
    )
    np.testing.assert_allclose(float(loss_pos), float(loss_all), rtol=1e-5)


def test_autodis_softmax_weights():
    layer = AutoDisLayer(num_features=3, num_buckets=4, embedding_dim=5)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6, 3)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    flat, emb = layer.apply(variables, x)
    assert flat.shape == (6, 15)
    assert emb.shape == (6, 3, 5)
    idx = layer.bucket_indices(x, variables)
    assert idx.shape == (6, 3)
    assert np.all((np.asarray(idx) >= 0) & (np.asarray(idx) < 4))


def test_ce_rows_matches_materialized_heads():
    """SFGDecoder.ce_rows (fused remat'd heads+CE) == __call__ + sfg_loss."""
    import jax

    from xdeepfm_tpu.pro.sfg import SFGDecoder, sfg_loss_rows

    rng = np.random.default_rng(3)
    B, F, E, D = 16, 3, 4, 2
    vocabs = (("C0", 7), ("C1", 5), ("C2", 9))
    emb = jnp.asarray(rng.normal(size=(B, F, E)).astype(np.float32))
    dense = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32))
    targets = {
        name: jnp.asarray(rng.integers(0, v, B)) for name, v in vocabs
    }
    dec = SFGDecoder(
        embedding_dim=E, sparse_vocab_sizes=vocabs, num_dense=D,
        hidden_units=(8, 6), dropout_rate=0.0,
    )
    variables = dec.init(jax.random.PRNGKey(0), emb, dense, labels)

    logits, dense_preds = dec.apply(variables, emb, dense, labels)
    want = sfg_loss(logits, dense_preds, targets, dense, labels,
                    positive_only=True)

    def fused(emb):
        ll, dp = dec.apply(
            variables, emb, dense, targets, labels, method=SFGDecoder.ce_rows
        )
        return sfg_loss_rows(ll, dp, dense, labels, positive_only=True)

    got = fused(emb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)
    # gradients flow through the remat'd path and match the materialized one
    g_fused = jax.grad(fused)(emb)

    def materialized(emb):
        logits, dp = dec.apply(variables, emb, dense, labels)
        return sfg_loss(logits, dp, targets, dense, labels, positive_only=True)

    g_mat = jax.grad(materialized)(emb)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_mat), rtol=1e-4, atol=1e-6
    )


def test_ce_rows_pallas_matches_materialized_heads():
    """SFGDecoder.ce_rows(impl='pallas') — the flash-CE kernel — matches the
    materialized-heads path in value AND in gradients w.r.t. embeddings and
    the head kernels/biases (interpret mode, fp32)."""
    from xdeepfm_tpu.ops import ce_pallas
    from xdeepfm_tpu.pro.sfg import SFGDecoder, sfg_loss_rows

    ce_pallas.set_interpret(True)
    old_prec = ce_pallas._PRECISION
    ce_pallas.set_precision("fp32")
    try:
        rng = np.random.default_rng(7)
        B, F, E, D = 16, 3, 4, 2
        vocabs = (("C0", 7), ("C1", 5), ("C2", 9))
        emb = jnp.asarray(rng.normal(size=(B, F, E)).astype(np.float32))
        dense = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32))
        targets = {
            name: jnp.asarray(rng.integers(0, v, B)) for name, v in vocabs
        }
        dec = SFGDecoder(
            embedding_dim=E, sparse_vocab_sizes=vocabs, num_dense=D,
            hidden_units=(8, 6), dropout_rate=0.0,
        )
        variables = dec.init(jax.random.PRNGKey(0), emb, dense, labels)

        def loss_with(impl):
            def f(variables, emb):
                ll, dp = dec.apply(
                    variables, emb, dense, targets, labels,
                    method=SFGDecoder.ce_rows, impl=impl,
                )
                return sfg_loss_rows(ll, dp, dense, labels, positive_only=True)
            return f

        want = loss_with("remat")(variables, emb)
        got = loss_with("pallas")(variables, emb)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

        gv_p, ge_p = jax.grad(loss_with("pallas"), argnums=(0, 1))(variables, emb)
        gv_r, ge_r = jax.grad(loss_with("remat"), argnums=(0, 1))(variables, emb)
        np.testing.assert_allclose(
            np.asarray(ge_p), np.asarray(ge_r), rtol=1e-4, atol=1e-6
        )
        flat_p = jax.tree_util.tree_leaves_with_path(gv_p)
        flat_r = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gv_r)}
        for k, v in flat_p:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
                rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(k),
            )
    finally:
        ce_pallas.set_interpret(False)
        ce_pallas.set_precision(old_prec)


def test_pro_trains_pallas_ce():
    """End-to-end xDeepFMPro fit with sfg_fused_ce='pallas' (interpret)."""
    from xdeepfm_tpu.ops import ce_pallas

    ce_pallas.set_interpret(True)
    try:
        x, y, cols = make_data(n=64)
        model = xDeepFMPro(
            cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4, 4),
            sfg_hidden_units=(8,), use_sfg=True, sfg_fused_ce="pallas",
        )
        model.compile("adam", "binary_crossentropy", metrics=["logloss"])
        hist = model.fit(x, y, batch_size=32, epochs=2, verbose=0)
        assert "sfg_loss" in hist.history
        assert np.isfinite(hist.history["loss"][-1])
    finally:
        ce_pallas.set_interpret(False)


def test_ce_rows_pallas_mixed_vocab_buckets():
    """Heads with different 128-padded vocabs split into a stacked-kernel
    group plus a singleton call; results must match the remat path."""
    from xdeepfm_tpu.ops import ce_pallas
    from xdeepfm_tpu.pro.sfg import SFGDecoder, sfg_loss_rows

    ce_pallas.set_interpret(True)
    ce_pallas.set_stack_heads(True)  # cover the opt-in stacked path
    old_prec = ce_pallas._PRECISION
    ce_pallas.set_precision("fp32")
    try:
        rng = np.random.default_rng(11)
        B, F, E, D = 12, 3, 4, 2
        # 50 and 100 pad to 128 (stacked pair); 300 pads to 384 (singleton)
        vocabs = (("C0", 50), ("C1", 300), ("C2", 100))
        emb = jnp.asarray(rng.normal(size=(B, F, E)).astype(np.float32))
        dense = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32))
        targets = {
            name: jnp.asarray(rng.integers(0, v, B)) for name, v in vocabs
        }
        dec = SFGDecoder(
            embedding_dim=E, sparse_vocab_sizes=vocabs, num_dense=D,
            hidden_units=(8, 6), dropout_rate=0.0,
        )
        variables = dec.init(jax.random.PRNGKey(3), emb, dense, labels)

        def loss_with(impl):
            def f(variables, emb):
                ll, dp = dec.apply(
                    variables, emb, dense, targets, labels,
                    method=SFGDecoder.ce_rows, impl=impl,
                )
                return sfg_loss_rows(ll, dp, dense, labels, positive_only=True)
            return f

        want = loss_with("remat")(variables, emb)
        got = loss_with("pallas")(variables, emb)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)
        gv_p, ge_p = jax.grad(loss_with("pallas"), argnums=(0, 1))(variables, emb)
        gv_r, ge_r = jax.grad(loss_with("remat"), argnums=(0, 1))(variables, emb)
        np.testing.assert_allclose(
            np.asarray(ge_p), np.asarray(ge_r), rtol=1e-4, atol=1e-6
        )
        for (k, v), (_, vr) in zip(
            jax.tree_util.tree_leaves_with_path(gv_p),
            jax.tree_util.tree_leaves_with_path(gv_r),
        ):
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(vr), rtol=1e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(k),
            )
    finally:
        ce_pallas.set_interpret(False)
        ce_pallas.set_stack_heads(False)
        ce_pallas.set_precision(old_prec)


@pytest.mark.parametrize("stack_heads", [True, False])
def test_ce_rows_pallas_row_mask_matches(stack_heads):
    """Masked flash-CE (rows sorted by the loss mask, tiles past the valid
    prefix skipped) matches the remat path in loss value and gradients —
    incl. a padded-tail sample_mask and a label mix (interpret mode)."""
    from xdeepfm_tpu.ops import ce_pallas
    from xdeepfm_tpu.pro.sfg import SFGDecoder, sfg_loss_rows

    ce_pallas.set_interpret(True)
    old_stack = ce_pallas.stack_heads_enabled()
    ce_pallas.set_stack_heads(stack_heads)
    old_prec = ce_pallas._PRECISION
    ce_pallas.set_precision("fp32")
    try:
        rng = np.random.default_rng(23)
        B, F, E, D = 24, 3, 4, 2
        vocabs = (("C0", 7), ("C1", 5), ("C2", 9))
        emb = jnp.asarray(rng.normal(size=(B, F, E)).astype(np.float32))
        dense = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32))
        sample_mask = jnp.asarray(
            (np.arange(B) < B - 3).astype(np.float32)  # padded tail rows
        )
        row_mask = (labels.reshape(-1) == 1).astype(jnp.float32) * sample_mask
        targets = {
            name: jnp.asarray(rng.integers(0, v, B)) for name, v in vocabs
        }
        dec = SFGDecoder(
            embedding_dim=E, sparse_vocab_sizes=vocabs, num_dense=D,
            hidden_units=(8, 6), dropout_rate=0.0,
        )
        variables = dec.init(jax.random.PRNGKey(0), emb, dense, labels)

        def loss_with(impl, mask=None):
            def f(variables, emb):
                ll, dp = dec.apply(
                    variables, emb, dense, targets, labels,
                    method=SFGDecoder.ce_rows, impl=impl, row_mask=mask,
                )
                return sfg_loss_rows(
                    ll, dp, dense, labels, sample_mask=sample_mask,
                    positive_only=True,
                )
            return f

        want = loss_with("remat")(variables, emb)
        got = loss_with("pallas", row_mask)(variables, emb)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                                   atol=1e-6)

        gv_p, ge_p = jax.grad(loss_with("pallas", row_mask), argnums=(0, 1))(
            variables, emb
        )
        gv_r, ge_r = jax.grad(loss_with("remat"), argnums=(0, 1))(
            variables, emb
        )
        np.testing.assert_allclose(
            np.asarray(ge_p), np.asarray(ge_r), rtol=1e-4, atol=1e-6
        )
        flat_r = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gv_r)}
        for k, v in jax.tree_util.tree_leaves_with_path(gv_p):
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
                rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(k),
            )
    finally:
        ce_pallas.set_interpret(False)
        ce_pallas.set_stack_heads(old_stack)
        ce_pallas.set_precision(old_prec)


def test_fused_ce_rows_num_valid_zero_contract():
    """Rows >= num_valid return exactly 0 and contribute no gradients even
    when they land inside the straddling batch tile (the tile-skip only
    elides WHOLE tiles; the wrappers zero the straddle remainder)."""
    from xdeepfm_tpu.ops import ce_pallas

    ce_pallas.set_interpret(True)
    try:
        rng = np.random.default_rng(11)
        B, K, V, nv = 16, 6, 12, 3
        h = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(K, V)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
        t = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        ll = ce_pallas.fused_ce_rows(h, W, b, t, num_valid=nv)
        np.testing.assert_allclose(np.asarray(ll[nv:]), 0.0)
        assert (np.asarray(ll[:nv]) != 0.0).all()

        def f(h, W, b):
            # unmasked sum: cotangent 1.0 lands on skipped rows too
            return jnp.sum(ce_pallas.fused_ce_rows(h, W, b, t, num_valid=nv))

        dh, _, _ = jax.grad(f, argnums=(0, 1, 2))(h, W, b)
        np.testing.assert_allclose(np.asarray(dh[nv:]), 0.0)
        assert np.isfinite(np.asarray(dh)).all()

        Ws = jnp.stack([W, W + 0.1])
        bs = jnp.stack([b, b - 0.2])
        ts = jnp.stack([t, (t + 1) % V])
        lls = ce_pallas.fused_ce_rows_stacked(h, Ws, bs, ts, num_valid=nv)
        np.testing.assert_allclose(np.asarray(lls[:, nv:]), 0.0)
        assert (np.asarray(lls[:, :nv]) != 0.0).all()
    finally:
        ce_pallas.set_interpret(False)


def test_ce_rows_pallas_all_rows_masked():
    """nv == 0 (no positive rows): loss is 0, gradients are finite zeros."""
    from xdeepfm_tpu.ops import ce_pallas
    from xdeepfm_tpu.pro.sfg import SFGDecoder, sfg_loss_rows

    ce_pallas.set_interpret(True)
    try:
        rng = np.random.default_rng(5)
        B, F, E, D = 16, 2, 4, 1
        vocabs = (("C0", 7), ("C1", 5))
        emb = jnp.asarray(rng.normal(size=(B, F, E)).astype(np.float32))
        dense = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        labels = jnp.zeros((B, 1), jnp.float32)
        row_mask = jnp.zeros((B,), jnp.float32)
        targets = {
            name: jnp.asarray(rng.integers(0, v, B)) for name, v in vocabs
        }
        dec = SFGDecoder(
            embedding_dim=E, sparse_vocab_sizes=vocabs, num_dense=D,
            hidden_units=(8,), dropout_rate=0.0,
        )
        variables = dec.init(jax.random.PRNGKey(0), emb, dense, labels)

        def f(emb):
            ll, dp = dec.apply(
                variables, emb, dense, targets, labels,
                method=SFGDecoder.ce_rows, impl="pallas", row_mask=row_mask,
            )
            return sfg_loss_rows(ll, dp, dense, labels, positive_only=True)

        val, g = jax.value_and_grad(f)(emb)
        assert float(val) == 0.0
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    finally:
        ce_pallas.set_interpret(False)


def test_pro_varlen_and_multidim_dense():
    """SFG + label attention must handle varlen-pooled fields in the decoder
    input (gate width = full field count) and multi-dim DenseFeats (dense
    head reconstructs the full dense WIDTH) — both crashed at init before
    round 4's width fixes."""
    from xdeepfm_tpu.features import (DenseFeat, SparseFeat,
                                      VarLenSparseFeat)
    from xdeepfm_tpu.pro import xDeepFMPro

    rng = np.random.default_rng(3)
    n, vocab, maxlen = 64, 20, 4
    lengths = rng.integers(1, maxlen + 1, n)
    seq_mask = np.arange(maxlen)[None, :] < lengths[:, None]
    x = {
        "C0": rng.integers(0, vocab, n),
        "item": rng.integers(0, vocab, n),
        "I0": rng.uniform(0, 1, (n, 2)).astype(np.float32),
        "hist": (rng.integers(1, vocab, (n, maxlen)) * seq_mask).astype(
            np.int64
        ),
        "len": lengths.astype(np.int64),
    }
    y = (x["C0"] % 2).astype(np.float32)
    cols = [
        SparseFeat("C0", vocab, embedding_dim=4),
        SparseFeat("item", vocab, embedding_dim=4),
        DenseFeat("I0", 2),
        VarLenSparseFeat(
            SparseFeat("hist", vocab, embedding_dim=4,
                       embedding_name="item"),
            maxlen=maxlen, length_name="len",
        ),
    ]
    m = xDeepFMPro(cols, cols, dnn_hidden_units=(8,), cin_layer_size=(4,),
                   sfg_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy", metrics=[])
    hist = m.fit(x, y, batch_size=32, epochs=1, verbose=0)
    assert np.isfinite(hist.history["loss"][-1])
    assert m.predict(x, 32).shape == (n, 1)


def test_pro_autodis_multidim_dense_rejected():
    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.pro import xDeepFMPro

    cols = [SparseFeat("C0", 10, embedding_dim=4), DenseFeat("I0", 2)]
    with pytest.raises(ValueError, match="AutoDis"):
        xDeepFMPro(cols, cols, use_autodis=True)
