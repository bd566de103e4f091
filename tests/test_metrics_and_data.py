"""Metric implementations vs sklearn; scaler/split/reader unit tests; engine
loss/optimizer variants."""

import numpy as np
import pytest

from xdeepfm_tpu import metrics as M


def test_auc_matches_sklearn_with_ties(rng):
    from sklearn.metrics import roc_auc_score as sk_auc

    y = rng.integers(0, 2, 500)
    # quantized scores -> heavy ties
    s = np.round(rng.uniform(0, 1, 500), 2)
    np.testing.assert_allclose(M.roc_auc_score(y, s), sk_auc(y, s), rtol=1e-12)


def test_logloss_matches_sklearn(rng):
    from sklearn.metrics import log_loss as sk_ll

    y = rng.integers(0, 2, 300)
    p = rng.uniform(0.01, 0.99, 300)
    np.testing.assert_allclose(M.log_loss(y, p), sk_ll(y, p), rtol=1e-9)


def test_device_auc_matches_exact(rng):
    import jax.numpy as jnp

    y = rng.integers(0, 2, 256).astype(np.float32)
    s = np.round(rng.uniform(0, 1, 256), 2).astype(np.float32)
    # pad 32 masked rows
    yp = np.concatenate([y, np.zeros(32, np.float32)])
    sp = np.concatenate([s, rng.uniform(0, 1, 32).astype(np.float32)])
    mask = np.concatenate([np.ones(256, np.float32), np.zeros(32, np.float32)])
    got = float(
        M.batch_auc(jnp.asarray(yp), jnp.asarray(sp), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, M.roc_auc_score(y, s), rtol=1e-6)


def test_minmax_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import MinMaxScaler as SK

    from xdeepfm_tpu.data import MinMaxScaler

    X = rng.normal(size=(50, 4)).astype(np.float32)
    X[:, 3] = 7.0  # zero-range column
    ours = MinMaxScaler().fit(X)
    theirs = SK(feature_range=(0, 1)).fit(X)
    np.testing.assert_allclose(
        ours.transform(X), theirs.transform(X).astype(np.float32),
        rtol=1e-5, atol=1e-6,
    )


def test_detect_sep(tmp_path):
    from xdeepfm_tpu.data import detect_sep

    p = tmp_path / "t.txt"
    p.write_text("a,b,c\n1\t2\t3\n")
    assert detect_sep(str(p)) == "\t"
    p.write_text("a,b,c\n1,2,3\n")
    assert detect_sep(str(p)) == ","


def test_train_test_split_stratify(rng):
    import pandas as pd

    from xdeepfm_tpu.data import train_test_split

    df = pd.DataFrame({"label": rng.integers(0, 2, 1000), "x": rng.normal(size=1000)})
    tr, te = train_test_split(df, 0.2, 0, stratify=df["label"])
    assert abs(len(te) - 200) <= 2
    np.testing.assert_allclose(
        te["label"].mean(), df["label"].mean(), atol=0.02
    )


@pytest.mark.parametrize("opt", ["sgd", "adagrad", "rmsprop"])
def test_engine_optimizers(opt):
    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import WDL

    rng = np.random.default_rng(0)
    n = 200
    x = {"C0": rng.integers(0, 10, n), "I0": rng.uniform(0, 1, n).astype(np.float32)}
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat("C0", 10, 4), DenseFeat("I0")]
    m = WDL(cols, cols, dnn_hidden_units=(8,))
    m.compile(opt, "binary_crossentropy", metrics=[])
    h = m.fit(x, y, batch_size=64, epochs=2, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_engine_regression_mse():
    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import WDL

    rng = np.random.default_rng(0)
    n = 300
    x = {"C0": rng.integers(0, 10, n), "I0": rng.uniform(0, 1, n).astype(np.float32)}
    y = (x["I0"] * 2.0).astype(np.float32)
    cols = [SparseFeat("C0", 10, 4), DenseFeat("I0")]
    m = WDL(cols, cols, dnn_hidden_units=(8,), task="regression")
    m.compile("adam", "mse", metrics=["mse"], lr=0.05)
    h = m.fit(x, y, batch_size=64, epochs=8, verbose=2)
    assert h.history["mse"][-1] < h.history["mse"][0]
    res = m.evaluate(x, y, 128)
    assert res["mse"] < 0.2


def test_validation_data_tuple3():
    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import WDL

    rng = np.random.default_rng(0)
    n = 200
    x = {"C0": rng.integers(0, 10, n), "I0": rng.uniform(0, 1, n).astype(np.float32)}
    y = (x["C0"] % 2).astype(np.float32)
    cols = [SparseFeat("C0", 10, 4), DenseFeat("I0")]
    m = WDL(cols, cols, dnn_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy", metrics=["auc"])
    h = m.fit(
        x, y, batch_size=64, epochs=1, verbose=0,
        validation_data=(x, y, None),
    )
    assert "val_auc" in h.history
    with pytest.raises(ValueError):
        m.fit(x, y, epochs=1, verbose=0, validation_data=(x,))


def _write_rows(path, rows, header=None, sep="\t"):
    with open(path, "w") as f:
        if header:
            f.write(sep.join(header) + "\n")
        for r in rows:
            f.write(sep.join(str(v) for v in r) + "\n")


def _synth_criteo_rows(n, labeled=True, seed=0, garbage_dense_at=None):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        dense = [f"{rng.uniform(0, 10):.2f}" for _ in range(13)]
        if garbage_dense_at is not None and i == garbage_dense_at:
            dense[3] = "oops"
        sparse = [f"v{rng.integers(0, 8)}" for _ in range(26)]
        row = dense + sparse
        if labeled:
            row = [int(rng.uniform() < 0.4)] + row
        rows.append(row)
    return rows


def test_pro_reader_headerless_labeled(tmp_path):
    """Pro variant (xdftrain_pro.py:123-190): a headerless 40-column file is
    detected as labeled and parsed with the canonical column names."""
    from xdeepfm_tpu.data import CRITEO_COLUMNS, read_criteo_like

    p = tmp_path / "headerless40.txt"
    _write_rows(p, _synth_criteo_rows(50, labeled=True))
    df = read_criteo_like(str(p), require_label=True)
    assert list(df.columns) == CRITEO_COLUMNS
    assert len(df) == 50
    assert set(df["label"].unique()) <= {0, 1}


def test_pro_reader_39col_dummy_label_and_require(tmp_path):
    """39-column (unlabeled) file: dummy label 0 injected when allowed,
    ValueError when a label is required (xdftrain_pro.py:146-156)."""
    from xdeepfm_tpu.data import CRITEO_COLUMNS, read_criteo_like

    p = tmp_path / "headerless39.txt"
    _write_rows(p, _synth_criteo_rows(30, labeled=False))
    df = read_criteo_like(str(p), require_label=False)
    assert list(df.columns) == CRITEO_COLUMNS
    assert (df["label"] == 0).all()
    with pytest.raises(ValueError):
        read_criteo_like(str(p), require_label=True)


def test_pro_reader_base_variant_unchanged(tmp_path):
    """require_label=None keeps the base reader: mixed header/data separators
    still resolve to the canonical schema (xdftrain.py:125-162)."""
    from xdeepfm_tpu.data import CRITEO_COLUMNS, read_criteo_like

    p = tmp_path / "mixed.txt"
    _write_rows(
        p, _synth_criteo_rows(20, labeled=True), header=CRITEO_COLUMNS,
        sep="\t",
    )
    # rewrite header comma-separated, rows tab-separated (mixed case)
    lines = open(p).read().splitlines()
    lines[0] = ",".join(CRITEO_COLUMNS)
    open(p, "w").write("\n".join(lines) + "\n")
    df = read_criteo_like(str(p))
    assert list(df.columns) == CRITEO_COLUMNS
    assert len(df) == 20


def test_prepare_features_coerce_dense(tmp_path):
    """coerce_dense=True (pro variant, xdftrain_pro.py:225-250): non-numeric
    dense values become 0 instead of raising."""
    from xdeepfm_tpu.data import (
        CRITEO_DENSE,
        CRITEO_SPARSE,
        prepare_features,
        read_criteo_like,
    )

    p = tmp_path / "garbage.txt"
    _write_rows(p, _synth_criteo_rows(40, labeled=True, garbage_dense_at=7))
    df = read_criteo_like(str(p), require_label=True)
    dfp, enc, scaler = prepare_features(
        df, CRITEO_SPARSE, CRITEO_DENSE, fit_df=df, coerce_dense=True
    )
    assert np.isfinite(dfp[CRITEO_DENSE].values).all()
    # the garbage cell scaled from 0 (the coerced value)
    assert dfp[CRITEO_DENSE].values.dtype == np.float32
    # base variant raises on the same frame
    with pytest.raises(ValueError):
        prepare_features(df, CRITEO_SPARSE, CRITEO_DENSE, fit_df=df)


def test_encoder_dtype_flip_canonical_stringization():
    """A NaN-bearing chunk promotes int64 -> float64; the same raw value
    must encode identically ('123', not '123.0' -> unknown 0)."""
    import pandas as pd

    from xdeepfm_tpu.data import SafeLabelEncoder

    enc = SafeLabelEncoder.fit(pd.Series([123, 456, 789], dtype="int64"))
    out = enc.transform(pd.Series([123.0, np.nan, 789.0], dtype="float64"))
    assert out.tolist() == [1, 0, 3]
    # and the reverse direction: fit on a float column, transform ints
    enc2 = SafeLabelEncoder.fit(pd.Series([1.0, 2.0, np.nan]))
    assert enc2.transform(pd.Series([1, 2], dtype="int64")).tolist() == [1, 2]


def test_train_test_split_int_count_with_stratify():
    """An absolute-count test_size with stratify allocates proportionally
    (sklearn semantics) instead of emptying the train split."""
    import pandas as pd

    from xdeepfm_tpu.data import train_test_split

    df = pd.DataFrame({"a": range(100)})
    labels = np.array([0] * 70 + [1] * 30)
    tr, te = train_test_split(df, test_size=10, random_state=0,
                              stratify=labels)
    assert len(te) == 10 and len(tr) == 90
    te_labels = labels[te.index]
    assert (te_labels == 1).sum() == 3  # proportional per class


def test_streaming_reader_39col_and_pinned_types(tmp_path):
    """Headerless 39-column (unlabeled) files stream correctly, and sparse
    columns stay strings even when the first block is all-digit (pyarrow
    first-block type inference would abort on a later hex token)."""
    from xdeepfm_tpu.data import (CRITEO_DENSE, CRITEO_SPARSE,
                                  _criteo_chunk_reader,
                                  fit_preprocessors_streaming,
                                  iter_criteo_batches)

    p39 = str(tmp_path / "t39.txt")
    rows = ["\t".join([str(i % 7)] * 13 + [f"a{i % 5:02x}"] * 26)
            for i in range(50)]
    with open(p39, "w") as f:
        f.write("\n".join(rows) + "\n")
    chunks = list(_criteo_chunk_reader(p39, 1000))
    assert sum(len(c) for c in chunks) == 50
    assert "label" not in chunks[0].columns
    enc, scaler, stats = fit_preprocessors_streaming(
        p39, CRITEO_SPARSE, CRITEO_DENSE
    )
    assert stats["n"] == 50 and stats["pos"] == 0
    batches = list(iter_criteo_batches(
        p39, CRITEO_SPARSE, CRITEO_DENSE, enc, scaler, batch_size=16,
        with_label=False,
    ))
    assert sum(len(y) for _, y in batches) == 50

    # digit-prefix then hex: pinned string type must survive the flip row
    pflip = str(tmp_path / "flip.txt")
    rows = ["\t".join(["1"] + ["0.5"] * 13 + ["123456"] * 26)
            for _ in range(10)]
    rows.append("\t".join(["0"] + ["0.5"] * 13 + ["a9d1b2"] * 26))
    with open(pflip, "w") as f:
        f.write("\n".join(rows) + "\n")
    total = sum(len(c) for c in _criteo_chunk_reader(pflip, 1000))
    assert total == 11


def test_streaming_coerce_dense(tmp_path):
    """The pro variant's dirty-dense tolerance works in streaming mode."""
    from xdeepfm_tpu.data import (CRITEO_DENSE, CRITEO_SPARSE,
                                  fit_preprocessors_streaming,
                                  iter_criteo_batches)

    p = str(tmp_path / "dirty.txt")
    rows = ["\t".join(["1"] + (["garbage"] if i == 0 else ["0.5"])
                      + ["0.5"] * 12 + ["tok"] * 26) for i in range(5)]
    with open(p, "w") as f:
        f.write("\n".join(rows) + "\n")
    enc, scaler, _ = fit_preprocessors_streaming(
        p, CRITEO_SPARSE, CRITEO_DENSE, coerce_dense=True
    )
    batches = list(iter_criteo_batches(
        p, CRITEO_SPARSE, CRITEO_DENSE, enc, scaler, batch_size=4,
        coerce_dense=True,
    ))
    assert sum(len(y) for _, y in batches) == 5
