"""Criteo-style data pipeline (reference: ``xdftrain.py:100-299``).

Readers sniff mixed header/data separators; SafeLabelEncoder maps known
categories to 1..N and unknown to 0 (fit on train only); MinMaxScaler scales
dense features to [0, 1].  The scaler is implemented natively (numpy) so
persisted preprocessors carry no sklearn dependency; semantics match
``sklearn.MinMaxScaler(feature_range=(0,1))`` including the zero-range guard.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from .features import DenseFeat, SparseFeat, get_feature_names

CRITEO_SPARSE = [f"C{i}" for i in range(1, 27)]
CRITEO_DENSE = [f"I{i}" for i in range(1, 14)]
CRITEO_COLUMNS = ["label"] + CRITEO_DENSE + CRITEO_SPARSE


def detect_sep(path: str) -> str:
    """Header and data may use different separators (``xdftrain.py:107-123``)."""
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        header_line = f.readline()
        data_line = f.readline()
    if data_line:
        if "\t" in data_line:
            return "\t"
        elif "," in data_line:
            return ","
    return "\t" if ("\t" in header_line and "," not in header_line) else ","


def read_criteo_like(path: str):
    """Robust Criteo reader (``xdftrain.py:125-162``): handles tab/comma and
    mixed header/data separators; columns label, I1..I13, C1..C26."""
    import pandas as pd

    expected = CRITEO_COLUMNS
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        header_line = f.readline().strip()
        data_line = f.readline().strip()
    header_sep = "\t" if ("\t" in header_line and "," not in header_line) else ","
    data_sep = "\t" if "\t" in data_line else ","
    if header_sep != data_sep:
        print(
            f"[WARN] Header uses '{header_sep!r}' but data uses '{data_sep!r}'. "
            "Fixing..."
        )
        header_cols = header_line.split(header_sep)
        if all(c in header_cols for c in expected):
            return pd.read_csv(
                path, sep=data_sep, skiprows=1, header=None, names=expected,
                engine="python",
            )
    df = pd.read_csv(path, sep=data_sep, engine="python")
    if all(c in df.columns for c in expected):
        return df
    return pd.read_csv(
        path, sep=data_sep, header=None, names=expected, engine="python"
    )


def read_criteo_test(path: str, sparse_features, dense_features):
    """Unlabeled 39-column test reader (``xdftrain.py:292-299``)."""
    import pandas as pd

    feature_cols = list(dense_features) + list(sparse_features)
    return pd.read_csv(
        path, sep="\t", header=None, names=feature_cols, engine="python"
    )


@dataclasses.dataclass
class SafeLabelEncoder:
    """Fit on train only; unknown -> 0, known -> 1..N (``xdftrain.py:165-185``)."""

    mapping: Dict[str, int]
    unk: int = 0

    @staticmethod
    def fit(series) -> "SafeLabelEncoder":
        import pandas as pd

        uniq = pd.Series(series.astype(str).unique())
        mapping = {v: i + 1 for i, v in enumerate(uniq.tolist())}
        return SafeLabelEncoder(mapping=mapping, unk=0)

    def transform(self, series) -> np.ndarray:
        s = series.astype(str)
        return s.map(self.mapping).fillna(self.unk).astype("int64").values


@dataclasses.dataclass
class MinMaxScaler:
    """Native [0,1] min-max scaler with sklearn's zero-range guard."""

    data_min_: Optional[np.ndarray] = None
    data_max_: Optional[np.ndarray] = None

    def fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        self.data_min_ = np.nanmin(X, axis=0)
        self.data_max_ = np.nanmax(X, axis=0)
        return self

    def transform(self, X):
        X = np.asarray(X, dtype=np.float64)
        rng = self.data_max_ - self.data_min_
        scale = np.where(rng == 0, 1.0, rng)
        return ((X - self.data_min_) / scale).astype(np.float32)

    def fit_transform(self, X):
        return self.fit(X).transform(X)


def prepare_features(
    df,
    sparse_features: List[str],
    dense_features: List[str],
    fit_df=None,
    encoders: Optional[Dict[str, SafeLabelEncoder]] = None,
    scaler: Optional[MinMaxScaler] = None,
):
    """fillna + encode + scale (``xdftrain.py:192-237``).  If fit_df is given,
    fit encoders/scaler on it; else use the provided ones."""
    df = df.copy()
    df[sparse_features] = df[sparse_features].fillna("-1")
    df[dense_features] = df[dense_features].fillna(0)

    if fit_df is not None:
        fit_df = fit_df.copy()
        fit_df[sparse_features] = fit_df[sparse_features].fillna("-1")
        fit_df[dense_features] = fit_df[dense_features].fillna(0)
        encoders = {
            feat: SafeLabelEncoder.fit(fit_df[feat]) for feat in sparse_features
        }
        scaler = MinMaxScaler()
        scaler.fit(fit_df[dense_features].astype("float32").values)

    assert encoders is not None and scaler is not None
    for feat in sparse_features:
        df[feat] = encoders[feat].transform(df[feat])
    df[dense_features] = scaler.transform(
        df[dense_features].astype("float32").values
    )
    for feat in sparse_features:
        df[feat] = df[feat].astype("int64")
    for feat in dense_features:
        df[feat] = df[feat].astype("float32")
    return df, encoders, scaler


def build_feature_columns(
    df_for_vocab,
    sparse_features: List[str],
    dense_features: List[str],
    embedding_dim: int = 4,
):
    """vocab = max_id + 1 since unknown -> 0 (``xdftrain.py:240-256``)."""
    cols = [
        SparseFeat(
            feat,
            vocabulary_size=int(df_for_vocab[feat].max()) + 1,
            embedding_dim=embedding_dim,
        )
        for feat in sparse_features
    ] + [DenseFeat(feat, 1) for feat in dense_features]
    linear_feature_columns = cols
    dnn_feature_columns = cols
    feature_names = get_feature_names(linear_feature_columns + dnn_feature_columns)
    return linear_feature_columns, dnn_feature_columns, feature_names


def build_model_input(df, feature_names: List[str]) -> Dict[str, np.ndarray]:
    return {name: df[name].values for name in feature_names}


def train_test_split(df, test_size: float, random_state: int, stratify=None):
    """Row split matching sklearn's default shuffle split semantics."""
    rng = np.random.default_rng(random_state)
    n = len(df)
    n_test = int(round(n * test_size)) if test_size < 1 else int(test_size)
    if stratify is not None:
        labels = np.asarray(stratify)
        test_idx = []
        for v in np.unique(labels):
            idx = np.flatnonzero(labels == v)
            k = int(round(len(idx) * test_size))
            test_idx.append(rng.permutation(idx)[:k])
        test_idx = np.concatenate(test_idx)
    else:
        test_idx = rng.permutation(n)[:n_test]
    test_mask = np.zeros(n, dtype=bool)
    test_mask[test_idx] = True
    return df.iloc[~test_mask], df.iloc[test_mask]


def iter_criteo_batches(
    path: str,
    sparse_features: List[str],
    dense_features: List[str],
    encoders: Dict[str, SafeLabelEncoder],
    scaler: MinMaxScaler,
    batch_size: int,
    chunksize: int = 200_000,
    with_label: bool = True,
):
    """Stream a criteo-like file as exactly-``batch_size`` ``(x, y)`` batches
    without loading it into memory (out-of-core training via
    ``BaseModel.fit_stream``; the reference reads the whole CSV into pandas,
    ``xdftrain.py:125-162``).

    Encoders/scaler must already be fit (e.g. on a prior pass or a sample);
    preprocessing per chunk is identical to :func:`prepare_features`.  The
    final batch may be shorter.  Separator handling mirrors
    :func:`read_criteo_like`.
    """
    reader = _criteo_chunk_reader(path, chunksize)

    feature_names = list(sparse_features) + list(dense_features)
    pend_x = {name: [] for name in feature_names}
    pend_y: List[np.ndarray] = []
    pending = 0

    def drain(final=False):
        nonlocal pending
        while pending >= batch_size or (final and pending):
            take = min(batch_size, pending)
            cat = {k: np.concatenate(v) if len(v) > 1 else v[0]
                   for k, v in pend_x.items()}
            yc = np.concatenate(pend_y) if len(pend_y) > 1 else pend_y[0]
            xb = {k: v[:take] for k, v in cat.items()}
            yb = yc[:take]
            for k in pend_x:
                pend_x[k] = [cat[k][take:]] if pending > take else []
            pend_y[:] = [yc[take:]] if pending > take else []
            pending -= take
            yield xb, yb

    for chunk in reader:
        df, _, _ = prepare_features(
            chunk, sparse_features, dense_features,
            encoders=encoders, scaler=scaler,
        )
        for name in feature_names:
            pend_x[name].append(df[name].values)
        if with_label:
            pend_y.append(df["label"].values.astype(np.float32))
        else:
            pend_y.append(np.zeros(len(df), np.float32))
        pending += len(df)
        yield from drain()
    yield from drain(final=True)


def _criteo_chunk_reader(path: str, chunksize: int):
    """Chunked criteo-like reader with :func:`read_criteo_like`'s separator
    handling (mixed header/data separators, headerless files)."""
    import pandas as pd

    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        header_line = f.readline().strip()
        data_line = f.readline().strip()
    header_sep = "\t" if ("\t" in header_line and "," not in header_line) else ","
    data_sep = "\t" if "\t" in data_line else ","
    header_cols = header_line.split(header_sep)
    if all(c in header_cols for c in CRITEO_COLUMNS):
        if header_sep == data_sep:
            return pd.read_csv(path, sep=data_sep, chunksize=chunksize)
        return pd.read_csv(
            path, sep=data_sep, skiprows=1, header=None,
            names=CRITEO_COLUMNS, chunksize=chunksize,
        )
    return pd.read_csv(
        path, sep=data_sep, header=None, names=CRITEO_COLUMNS,
        chunksize=chunksize,
    )


def fit_preprocessors_streaming(
    path: str,
    sparse_features: List[str],
    dense_features: List[str],
    chunksize: int = 200_000,
):
    """One streaming pass fitting the preprocessors without loading the file:
    SafeLabelEncoder vocabularies (first-appearance order — identical to
    fitting on the fully-loaded frame) and MinMaxScaler min/max (after the
    same ``fillna(0)`` the bulk path applies, ``xdftrain.py:192-237``).

    Returns ``(encoders, scaler, stats)`` with
    ``stats = {"n", "pos", "pos_ratio", "label_nan"}``.
    """
    import pandas as pd

    mappings: Dict[str, Dict[str, int]] = {f: {} for f in sparse_features}
    data_min = None
    data_max = None
    n = 0
    pos = 0
    label_nan = 0
    for chunk in _criteo_chunk_reader(path, chunksize):
        chunk[sparse_features] = chunk[sparse_features].fillna("-1")
        chunk[dense_features] = chunk[dense_features].fillna(0)
        for feat in sparse_features:
            m = mappings[feat]
            for v in pd.unique(chunk[feat].astype(str)):
                if v not in m:
                    m[v] = len(m) + 1
        X = chunk[dense_features].astype("float64").values
        cmin = np.nanmin(X, axis=0)
        cmax = np.nanmax(X, axis=0)
        data_min = cmin if data_min is None else np.minimum(data_min, cmin)
        data_max = cmax if data_max is None else np.maximum(data_max, cmax)
        labels = pd.to_numeric(chunk["label"], errors="coerce")
        label_nan += int(labels.isna().sum())
        labels = labels.fillna(0)
        n += len(chunk)
        pos += int((labels == 1).sum())
    encoders = {
        feat: SafeLabelEncoder(mapping=mappings[feat])
        for feat in sparse_features
    }
    scaler = MinMaxScaler(data_min_=data_min, data_max_=data_max)
    stats = {
        "n": n,
        "pos": pos,
        "pos_ratio": (pos / n) if n else 0.0,
        "label_nan": label_nan,
    }
    return encoders, scaler, stats


def extend_preprocessors(
    encoders: Dict[str, SafeLabelEncoder],
    scaler: MinMaxScaler,
    df,
    sparse_features: List[str],
    dense_features: List[str],
):
    """Extend fitted preprocessors with another frame, in place — matches
    fitting on the concatenation (the eval CLI fits encoders on train+eval
    combined, ``xdftrain.py:372-383``): unseen categories append in
    first-appearance order; scaler min/max widen elementwise."""
    import pandas as pd

    df = df.copy()
    df[sparse_features] = df[sparse_features].fillna("-1")
    df[dense_features] = df[dense_features].fillna(0)
    for feat in sparse_features:
        m = encoders[feat].mapping
        for v in pd.unique(df[feat].astype(str)):
            if v not in m:
                m[v] = len(m) + 1
    X = df[dense_features].astype("float64").values
    scaler.data_min_ = np.minimum(scaler.data_min_, np.nanmin(X, axis=0))
    scaler.data_max_ = np.maximum(scaler.data_max_, np.nanmax(X, axis=0))
    return encoders, scaler


def feature_columns_from_encoders(
    encoders: Dict[str, SafeLabelEncoder],
    sparse_features: List[str],
    dense_features: List[str],
    embedding_dim: int = 4,
):
    """Feature columns without a materialized frame: vocab = len(mapping)+1
    (ids are 1..N with unknown->0, so max_id + 1 == len + 1; mirrors
    :func:`build_feature_columns` / ``xdftrain.py:240-256``)."""
    cols = [
        SparseFeat(
            feat,
            vocabulary_size=len(encoders[feat].mapping) + 1,
            embedding_dim=embedding_dim,
        )
        for feat in sparse_features
    ] + [DenseFeat(feat, 1) for feat in dense_features]
    feature_names = get_feature_names(cols + cols)
    return cols, cols, feature_names
