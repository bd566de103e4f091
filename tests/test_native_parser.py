"""Native C++ Criteo parser vs the pandas pipeline."""

import numpy as np
import pytest

from xdeepfm_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


@pytest.fixture
def criteo_file(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "train.txt"
    cols = (
        ["label"]
        + [f"I{i}" for i in range(1, 14)]
        + [f"C{i}" for i in range(1, 27)]
    )
    lines = ["\t".join(cols)]
    for _ in range(100):
        label = rng.integers(0, 2)
        dense = [
            f"{rng.uniform(0, 100):.2f}" if rng.uniform() > 0.1 else ""
            for _ in range(13)
        ]
        sparse = [
            f"cat{rng.integers(0, 10):x}" if rng.uniform() > 0.05 else ""
            for _ in range(26)
        ]
        lines.append("\t".join([str(label)] + dense + sparse))
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_native_matches_pandas_pipeline(criteo_file):
    import pandas as pd

    from xdeepfm_tpu.data import SafeLabelEncoder, read_criteo_like

    p = native.NativeCriteoParser()
    labels, dense, ids = p.fit_transform(criteo_file)
    assert len(labels) == 100
    assert dense.shape == (100, 13)
    assert ids.shape == (100, 26)

    df = read_criteo_like(criteo_file)
    np.testing.assert_allclose(
        labels, df["label"].astype(np.float32).values, rtol=1e-6
    )
    # dense: missing -> 0 (reference fillna(0))
    expect_dense = (
        df[[f"I{i}" for i in range(1, 14)]].fillna(0).astype(np.float32).values
    )
    np.testing.assert_allclose(dense, expect_dense, rtol=1e-5)
    # sparse ids: first-appearance order 1..N, missing -> "-1" token — exactly
    # SafeLabelEncoder semantics, so ids must match the python encoder.
    for j, c in enumerate([f"C{i}" for i in range(1, 27)]):
        col = df[c].fillna("-1")
        le = SafeLabelEncoder.fit(col)
        expect = le.transform(col)
        np.testing.assert_array_equal(ids[:, j], expect, err_msg=c)


def test_native_transform_unknowns(criteo_file, tmp_path):
    p = native.NativeCriteoParser()
    _, _, ids_fit = p.fit_transform(criteo_file)
    vocab = p.vocab_sizes()
    assert (vocab >= ids_fit.max(axis=0) + 1).all()

    # vocab round-trip through save/load
    vpath = str(tmp_path / "vocab.bin")
    p.save_vocab(vpath)
    p2 = native.NativeCriteoParser()
    p2.load_vocab(vpath)
    _, _, ids2 = p2.transform(criteo_file)
    np.testing.assert_array_equal(ids2, ids_fit)

    # unseen tokens in transform mode -> 0
    unk = tmp_path / "unk.txt"
    row = ["1"] + ["1.0"] * 13 + ["zzz_never_seen"] * 26
    unk.write_text("\t".join(row) + "\n")
    _, _, ids_unk = p2.transform(str(unk))
    assert (ids_unk == 0).all()
