"""Lazy (row-sparse) embedding optimizer: touched-row semantics + learning."""

import numpy as np
import jax

from xdeepfm_tpu.features import DenseFeat, SparseFeat
from xdeepfm_tpu.models import DeepFM, xDeepFM


def _data(n=256, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(4)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, 8) for i in range(4)] + [DenseFeat("I0")]
    return x, y, cols


def test_lazy_only_touches_seen_rows():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    assert m._lazy_tables, "lazy specs should exist"
    before = np.asarray(m.params["embedding_dict"]["table_d8"]).copy()
    # batch touching only ids {0, 1} of each feature
    xb = {f"C{i}": np.array([0, 1, 0, 1]) for i in range(4)}
    xb["I0"] = np.zeros(4, np.float32)
    yb = np.array([0, 1, 0, 1], np.float32)
    m.fit(xb, yb, batch_size=4, epochs=1, verbose=0, shuffle=False)
    after = np.asarray(m.params["embedding_dict"]["table_d8"])
    vocab = 64
    for feat_idx in range(4):
        off = feat_idx * vocab
        touched = after[off : off + 2]
        untouched = after[off + 2 : off + vocab]
        assert not np.allclose(touched, before[off : off + 2])
        np.testing.assert_array_equal(untouched, before[off + 2 : off + vocab])


def test_lazy_learns_comparably():
    x, y, cols = _data()
    res = {}
    for mode in ("dense", "lazy"):
        m = xDeepFM(
            cols, cols, dnn_hidden_units=(16,), cin_layer_size=(8,), seed=7
        )
        m.compile("adam", "binary_crossentropy", metrics=["auc"],
                  embedding_optimizer=mode)
        m.fit(x, y, batch_size=64, epochs=6, verbose=0)
        res[mode] = m.evaluate(x, y, 128)["auc"]
    assert res["lazy"] > 0.9, res
    assert abs(res["lazy"] - res["dense"]) < 0.05, res


def test_lazy_adagrad():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adagrad", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    h = m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_lazy_checkpoint_roundtrip(tmp_path):
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy")
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    p = str(tmp_path / "c.bin")
    m.save_checkpoint(p, epoch=1)
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m2.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy")
    assert m2.load_checkpoint(p) == 1
    np.testing.assert_allclose(m2.predict(x, 128), m.predict(x, 128), rtol=1e-6)


def _varlen_data(n=128, vocab=50, seed=3):
    from xdeepfm_tpu.features import VarLenSparseFeat

    rng = np.random.default_rng(seed)
    # heavy duplication within each batch to exercise duplicate-id handling
    x = {f"C{i}": rng.integers(0, 8, n) for i in range(3)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    x["hist"] = rng.integers(0, vocab, (n, 4))
    y = rng.integers(0, 2, n).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, 8) for i in range(3)] + [
        DenseFeat("I0"),
        VarLenSparseFeat(SparseFeat("hist", vocab, 8), maxlen=4,
                         combiner="mean"),
    ]
    return x, y, cols


def _canonical_state(m):
    """(canonical params, lazy row states) whatever the embedding_layout —
    packed groups surface their in-array state columns per member."""
    params = m.get_weights()["params"]
    lazy = {
        p: np.asarray(v)
        for p, v in m._canonical_opt_state().get("lazy", {}).items()
    }
    return params, lazy


def test_gradient_split_matches_dense_grad_lazy():
    """embedding_gradient='split' (lookup-boundary autodiff cut; packed
    param|state layout under embedding_layout='auto') must produce the same
    training trajectory AND row moments as the dense-cotangent lazy path."""
    x, y, cols = _varlen_data()
    params, lazy = {}, {}
    for mode in ("dense", "split"):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient=mode)
        m.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
        if mode == "split":
            assert m._packed_tables, "auto layout should pack in split mode"
        params[mode], lazy[mode] = _canonical_state(m)
    flat_d = jax.tree_util.tree_flatten_with_path(params["dense"])[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(params["split"])[0])
    for path, wd in flat_d:
        np.testing.assert_allclose(
            wd, flat_s[path], rtol=2e-5, atol=1e-7, err_msg=str(path)
        )
    assert set(lazy["dense"]) == set(lazy["split"])
    for p in lazy["dense"]:
        # same fp32 accumulation-order tolerance as the params: the dense
        # path's scatter-add dedup and split's cumsum run-sums order the
        # duplicate-gradient sums differently (~8e-8 max, measured)
        np.testing.assert_allclose(
            lazy["dense"][p], lazy["split"][p], rtol=2e-5, atol=1e-7,
            err_msg=p,
        )


def test_duplicate_feature_column_split_parity():
    """A feature listed twice in the column list maps to ONE batch column
    (the schema dedups names); table_touched_spec must dedup its entries the
    same way or the gradient-split occurrence block desyncs from
    _occ_layout's position map (regression test)."""
    x, y, cols = _data()
    cols_dup = list(cols) + [cols[0]]  # C0 appears twice
    params = {}
    for mode in ("dense", "split"):
        m = DeepFM(cols_dup, cols_dup, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient=mode)
        m.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
        params[mode] = _canonical_state(m)[0]
    flat_d = jax.tree_util.tree_flatten_with_path(params["dense"])[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(params["split"])[0])
    for path, wd in flat_d:
        # atol looser than the non-dup parity test: the duplicated use adds
        # a second scatter-add whose fp32 accumulation order differs between
        # the modes (~3e-7 after 16 adam steps, measured)
        np.testing.assert_allclose(
            wd, flat_s[path], rtol=2e-5, atol=2e-6, err_msg=str(path)
        )


def test_gradient_split_multi_dispatch():
    x, y, cols = _varlen_data()
    preds = {}
    for k in (1, 4):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split")
        m.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False,
              steps_per_dispatch=k)
        preds[k] = m.predict(x, 64)
    np.testing.assert_allclose(preds[1], preds[4], rtol=1e-6)


def test_gradient_split_untouched_rows_frozen():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split")
    before = np.asarray(m.params["embedding_dict"]["table_d8"]).copy()
    xb = {f"C{i}": np.array([0, 1, 0, 1]) for i in range(4)}
    xb["I0"] = np.zeros(4, np.float32)
    yb = np.array([0, 1, 0, 1], np.float32)
    m.fit(xb, yb, batch_size=4, epochs=1, verbose=0, shuffle=False)
    after = np.asarray(m.params["embedding_dict"]["table_d8"])
    for feat_idx in range(4):
        off = feat_idx * 64
        assert not np.allclose(after[off : off + 2], before[off : off + 2])
        np.testing.assert_array_equal(
            after[off + 2 : off + 64], before[off + 2 : off + 64]
        )


def test_packed_vs_flat_layout_parity():
    """embedding_layout='packed' ([rows, (1+k)D] param|state arrays, one
    gather + one scatter per table) must track the 'flat' layout (separate
    param/state arrays): same math — tolerances cover XLA fusion rounding
    differences from the reshaped op graph (~2e-8 max, measured)."""
    x, y, cols = _varlen_data()
    out = {}
    for layout in ("flat", "packed"):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split",
                  embedding_layout=layout)
        assert bool(m._packed_tables) == (layout == "packed")
        m.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
        out[layout] = (_canonical_state(m), m.predict(x, 64))
    (pf, lf), predf = out["flat"]
    (pp, lp), predp = out["packed"]
    np.testing.assert_allclose(predp, predf, rtol=1e-6)
    flat_f = jax.tree_util.tree_flatten_with_path(pf)[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(pp)[0])
    for path, w in flat_f:
        np.testing.assert_allclose(
            w, flat_p[path], rtol=1e-5, atol=1e-7, err_msg=str(path)
        )
    for p in lf:
        np.testing.assert_allclose(lf[p], lp[p], rtol=1e-5, atol=1e-7,
                                   err_msg=p)


def test_packed_adagrad_trains():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adagrad", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split",
              embedding_layout="packed")
    assert all(k == 1 for _, k in m._packed_tables.values())
    h = m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_packed_checkpoint_cross_format(tmp_path):
    """Checkpoints are byte-compatible across embedding_layout settings:
    train packed -> save -> load into a FLAT-layout model (and the reverse),
    with identical predictions and identical resumed training."""
    x, y, cols = _varlen_data()

    def build(layout):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split",
                  embedding_layout=layout)
        return m

    for src, dst in (("packed", "flat"), ("flat", "packed")):
        m1 = build(src)
        m1.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
        p = str(tmp_path / f"c_{src}.bin")
        m1.save_checkpoint(p, epoch=1)
        m2 = build(dst)
        assert m2.load_checkpoint(p) == 1
        np.testing.assert_allclose(
            m2.predict(x, 64), m1.predict(x, 64), rtol=1e-6,
            err_msg=f"{src}->{dst}",
        )
        # resumed training continues identically (moments restored)
        m1.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
        m2.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
        np.testing.assert_allclose(
            m2.predict(x, 64), m1.predict(x, 64), rtol=1e-5, atol=1e-8,
            err_msg=f"{src}->{dst} resume",
        )


def test_packed_weights_io_canonical(tmp_path):
    """get/set_weights + save/load_weights speak the canonical format on a
    packed model; set_weights preserves the in-array optimizer state."""
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split",
              embedding_layout="packed")
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
    w = m.get_weights()
    table = w["params"]["embedding_dict"]["table_d8"]
    assert table.shape[1] == 8  # canonical dim, not the packed 24
    _, lazy_before = _canonical_state(m)
    m.set_weights(w)
    _, lazy_after = _canonical_state(m)
    for p in lazy_before:
        np.testing.assert_array_equal(lazy_before[p], lazy_after[p])
    # save_weights/load_weights round trip into a fresh packed model
    wpath = str(tmp_path / "w.bin")
    m.save_weights(wpath)
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m2.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy", embedding_gradient="split",
               embedding_layout="packed")
    m2.load_weights(wpath)
    np.testing.assert_allclose(m2.predict(x, 64), m.predict(x, 64),
                               rtol=1e-6)


def test_bf16_state_packed_trains_and_tracks_f32():
    """embedding_state_dtype='bfloat16': moments stored as bf16 pairs
    bit-packed into fp32 columns (half the state HBM — the difference
    between 104M-row adam fitting one chip or not).  Must learn, track the
    fp32-state trajectory closely, and keep untouched rows frozen."""
    x, y, cols = _varlen_data()
    out = {}
    for dt in ("float32", "bfloat16"):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split",
                  embedding_state_dtype=dt)
        h = m.fit(x, y, batch_size=32, epochs=3, verbose=0, shuffle=False)
        out[dt] = (m, h.history["loss"])
    mb, losses_b = out["bfloat16"]
    mf, losses_f = out["float32"]
    # the group fuses main table_d8 + linear table_d1 (same id pattern):
    # dsum 9; adam k=2 -> 9 bf16-pair state slots instead of 18 fp32
    assert mb.params["embedding_dict"]["table_d8"].shape[1] == 9 + 9
    assert mf.params["embedding_dict"]["table_d8"].shape[1] == 9 + 18
    assert losses_b[-1] < losses_b[0]
    # trajectories track within bf16 moment-rounding tolerance
    np.testing.assert_allclose(losses_b, losses_f, rtol=2e-3)
    np.testing.assert_allclose(
        mb.predict(x, 64), mf.predict(x, 64), rtol=0.02, atol=2e-4
    )


def test_bf16_state_untouched_rows_frozen():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adagrad", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split",
              embedding_state_dtype="bfloat16")
    # group dsum 9 (main d8 + linear d1), adagrad k=1 -> 5 bf16-pair slots
    assert m.params["embedding_dict"]["table_d8"].shape[1] == 9 + 5
    before = np.asarray(m.params["embedding_dict"]["table_d8"]).copy()
    xb = {f"C{i}": np.array([0, 1, 0, 1]) for i in range(4)}
    xb["I0"] = np.zeros(4, np.float32)
    yb = np.array([0, 1, 0, 1], np.float32)
    m.fit(xb, yb, batch_size=4, epochs=1, verbose=0, shuffle=False)
    after = np.asarray(m.params["embedding_dict"]["table_d8"])
    for feat_idx in range(4):
        off = feat_idx * 64
        assert not np.allclose(after[off : off + 2], before[off : off + 2])
        np.testing.assert_array_equal(
            after[off + 2 : off + 64], before[off + 2 : off + 64]
        )


def test_bf16_state_checkpoint_cross_format(tmp_path):
    """bf16-packed checkpoints are written fp32-canonical: they load into a
    flat fp32 model (decoded moments) and back (re-encoded) losslessly for
    bf16-representable states."""
    x, y, cols = _varlen_data()

    def build(layout, dt):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split",
                  embedding_layout=layout, embedding_state_dtype=dt)
        return m

    m1 = build("packed", "bfloat16")
    m1.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
    p = str(tmp_path / "c.bin")
    m1.save_checkpoint(p, epoch=1)
    # -> flat fp32 model: moments arrive decoded
    m2 = build("flat", "float32")
    assert m2.load_checkpoint(p) == 1
    np.testing.assert_allclose(m2.predict(x, 64), m1.predict(x, 64),
                               rtol=1e-6)
    st_flat = np.asarray(
        m2.opt_state["lazy"]["embedding_dict/table_d8"]
    )
    st_decoded = np.asarray(
        m1._canonical_opt_state()["lazy"]["embedding_dict/table_d8"]
    )
    np.testing.assert_array_equal(st_flat, st_decoded)
    # -> back into a bf16-packed model: bit-identical state storage
    m3 = build("packed", "bfloat16")
    assert m3.load_checkpoint(p) == 1
    np.testing.assert_array_equal(
        np.asarray(m3.params["embedding_dict"]["table_d8"]),
        np.asarray(m1.params["embedding_dict"]["table_d8"]),
    )


def test_bf16_state_odd_dim_adagrad():
    """Odd k*D exercises the codec's bf16 pad slot: D=5, adagrad k=1 ->
    3 fp32 storage columns (5 bf16 values + 1 pad)."""
    rng = np.random.default_rng(0)
    n, vocab = 256, 64
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(4)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, 5) for i in range(4)] + [
        DenseFeat("I0")
    ]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adagrad", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split",
              embedding_state_dtype="bfloat16")
    # group dsum 6 (main d5 + linear d1), k=1 -> 3 bf16-pair slots
    assert m.params["embedding_dict"]["table_d5"].shape[1] == 6 + 3
    h = m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]
    # canonical state decodes to the right width
    st = m._canonical_opt_state()["lazy"]["embedding_dict/table_d5"]
    assert st.shape[1] == 5
    assert np.isfinite(np.asarray(st)).all()


def test_packed_groups_behavior_sequence_models():
    """DIN/DIEN have no linear_model subtree and varlen-heavy id patterns:
    their lazy tables form SINGLETON groups and still train/predict under
    the packed layout."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_sequence_models import make_seq_data

    from xdeepfm_tpu.models import DIEN

    x, y, cols = make_seq_data(n=128, vocab=12, maxlen=6, with_neg=True)
    m = DIEN(cols, ["item"], gru_type="AUGRU", use_negsampling=True,
             dnn_hidden_units=(16, 8))
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split")
    assert [len(g["members"]) for g in m._packed_groups] == [1]
    h = m.fit(x, y, batch_size=64, epochs=2, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]
    assert np.isfinite(m.predict(x, 64)).all()


def test_pack_spill_path_correct(monkeypatch):
    """At the HBM capacity edge _pack_params spills the smaller canonical
    tables to host while the largest packs (BASELINE.md round-5).  Force the
    path with a tiny budget and assert the packed result is identical to
    the no-spill pack."""
    x, y, cols = _data()

    def build():
        return DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)

    m1 = build()
    m1.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy", embedding_gradient="split")
    monkeypatch.setenv("XDEEPFM_HBM_BUDGET", "1")  # everything spills
    m2 = build()
    m2.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy", embedding_gradient="split")
    assert m1._packed_tables == m2._packed_tables
    for p, w in jax.tree_util.tree_flatten_with_path(m1.params)[0]:
        w2 = m2.params
        for seg in [str(getattr(k, "key", k)) for k in p]:
            w2 = w2[seg]
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
    # and the spilled-pack model trains normally
    h = m2.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert np.isfinite(h.history["loss"][0])


def test_bf16_state_requires_packed_split():
    import pytest

    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    with pytest.raises(ValueError):
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient="split",
                  embedding_layout="flat",
                  embedding_state_dtype="bfloat16")
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    with pytest.raises(ValueError):
        m2.compile("adam", "binary_crossentropy", metrics=[],
                   embedding_state_dtype="bfloat16")


def test_embedding_optimizer_auto_small_tables_dense():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="auto")
    assert not m._lazy_tables  # 256-row tables -> dense streaming
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_gradient_split_tracked_reg_value_matches_full_scan():
    """Split mode tracks sum(w^2) incrementally in opt_state['reg'] instead of
    re-scanning the full table each step; the logged loss (which includes the
    reg VALUE, reference basemodel.py:254-257) must match the dense-cotangent
    lazy path's full-scan value over a multi-epoch run."""
    x, y, cols = _varlen_data()
    hist = {}
    for mode in ("dense", "split"):
        m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
        m.compile("adam", "binary_crossentropy", metrics=[],
                  embedding_optimizer="lazy", embedding_gradient=mode)
        h = m.fit(x, y, batch_size=32, epochs=3, verbose=0, shuffle=False)
        hist[mode] = h.history["loss"]
        if mode == "split":
            assert m.opt_state.get("reg"), "tracked reg scalars expected"
            # tracked scalar == true full-table sum(w^2) after training
            # (canonical param columns only — the packed layout stores
            # optimizer state alongside)
            canon = _canonical_state(m)[0]
            for path, val in m.opt_state["reg"].items():
                tree = canon
                for seg in path.split("/"):
                    tree = tree[seg]
                np.testing.assert_allclose(
                    float(val), float(np.sum(np.square(np.asarray(tree)))),
                    rtol=1e-4, err_msg=path,
                )
    np.testing.assert_allclose(hist["dense"], hist["split"], rtol=1e-4)


def test_gradient_split_checkpoint_roundtrip(tmp_path):
    """opt_state['reg'] (tracked scalars) must survive save/load_checkpoint."""
    x, y, cols = _varlen_data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="lazy", embedding_gradient="split")
    m.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
    p = str(tmp_path / "c.bin")
    m.save_checkpoint(p, epoch=1)
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
    m2.compile("adam", "binary_crossentropy", metrics=[],
               embedding_optimizer="lazy", embedding_gradient="split")
    assert m2.load_checkpoint(p) == 1
    for path, val in m.opt_state["reg"].items():
        np.testing.assert_allclose(
            float(m2.opt_state["reg"][path]), float(val), err_msg=path
        )
    # resumed training continues identically
    m.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
    m2.fit(x, y, batch_size=32, epochs=1, verbose=0, shuffle=False)
    np.testing.assert_allclose(m2.predict(x, 64), m.predict(x, 64), rtol=1e-6)


def test_embedding_optimizer_auto_large_tables_lazy(monkeypatch):
    """auto picks lazy at/above the AUTO_LAZY_MIN_ROWS crossover (threshold
    patched down so the test stays small)."""
    import xdeepfm_tpu.basemodel as bm

    x, y, cols = _data()
    monkeypatch.setattr(bm, "AUTO_LAZY_MIN_ROWS", 64)
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[],
              embedding_optimizer="auto")
    assert m._lazy_tables, "256-row stacked table >= patched threshold"
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_embedding_optimizer_auto_non_string_optimizer_dense(monkeypatch):
    """auto falls back to dense when the optimizer isn't a lazy-capable
    string (e.g. a raw optax transform)."""
    import optax

    import xdeepfm_tpu.basemodel as bm

    x, y, cols = _data()
    monkeypatch.setattr(bm, "AUTO_LAZY_MIN_ROWS", 64)
    m = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    m.compile(optax.adam(1e-3), "binary_crossentropy", metrics=[],
              embedding_optimizer="auto")
    assert not m._lazy_tables
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)
