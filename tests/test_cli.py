"""CLI integration: generated Criteo-like corpus -> train -> artifacts."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def criteo_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("criteo")
    path = d / "train.txt"
    cols = (
        ["label"]
        + [f"I{i}" for i in range(1, 14)]
        + [f"C{i}" for i in range(1, 27)]
    )
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")  # header comma-separated
        for _ in range(400):
            label = rng.integers(0, 2)
            dense = [
                f"{rng.uniform(0, 100):.2f}" if rng.uniform() > 0.1 else ""
                for _ in range(13)
            ]
            sparse = [
                f"cat{rng.integers(0, 15):x}" if rng.uniform() > 0.05 else ""
                for _ in range(26)
            ]
            # data tab-separated (mixed-separator case, xdftrain.py:142-152)
            f.write("\t".join([str(label)] + dense + sparse) + "\n")
    return str(path)


def _common_args(criteo_file, out):
    return [
        "--data_path", criteo_file, "--out_dir", out, "--mode", "eval",
        "--epochs", "1", "--batch_size", "128", "--embedding_dim", "4",
        "--verbose", "0",
    ]


def test_xdftrain_eval(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain import main

    out = str(tmp_path / "out")
    log = main(_common_args(criteo_file, out))
    for artifact in (
        "history.json",
        "preprocess.pkl",
        "training_log.json",
        "xdeepfm_best.weights",
        "xdeepfm_weights.bin",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    assert 0.0 <= log["results"]["eval_auc"] <= 1.0
    with open(os.path.join(out, "training_log.json")) as f:
        saved = json.load(f)
    assert saved["mode"] == "eval"
    assert saved["data_info"]["train_samples"] == 360


def test_xdftrain_final(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain import main

    out = str(tmp_path / "out_final")
    main(
        [
            "--data_path", criteo_file, "--out_dir", out, "--mode", "final",
            "--epochs", "1", "--batch_size", "128", "--embedding_dim", "4",
            "--verbose", "0",
        ]
    )
    assert os.path.exists(os.path.join(out, "xdeepfm_full_weights.bin"))
    assert os.path.exists(os.path.join(out, "history_full.json"))


def test_xdftrain_attn(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain_attn import main

    out = str(tmp_path / "out_attn")
    log = main(
        _common_args(criteo_file, out)
        + ["--model_version", "v2", "--cin_num_heads", "2"]
    )
    assert log["model_config"]["model_version"] == "v2"


def test_xdftrain_v1_threeway_split(criteo_file, tmp_path):
    """v1 eval does the in-file 3-way split (xdftrain_v1.py:322-330): train
    fraction (1-test_size)*(1-val_size), metrics from the held-out TEST
    split, preprocessors fit on train only."""
    from xdeepfm_tpu.cli.xdftrain_v1 import main

    out = str(tmp_path / "out_v1")
    log = main(
        _common_args(criteo_file, out)
        + ["--test_size", "0.25", "--val_size", "0.25"]
    )
    info = log["data_info"]
    assert info["total_samples"] == 400
    assert info["test_samples"] == 100          # 400 * 0.25
    assert info["val_samples"] == 75            # 300 * 0.25
    assert info["train_samples"] == 225
    assert "test_auc" in log["results"] and "test_logloss" in log["results"]
    assert 0.0 <= log["results"]["test_auc"] <= 1.0
    assert log["training_config"]["test_size"] == 0.25
    assert log["training_config"]["optimizer"] == "adagrad"  # v1 default
    for artifact in (
        "history.json", "preprocess.pkl", "training_log.json",
        "xdeepfm_v1_weights.bin",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact


def test_xdftrain_pro(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain_pro import main

    out = str(tmp_path / "out_pro")
    log = main(
        _common_args(criteo_file, out)
        + ["--use_sfg", "--sfg_weight", "0.1", "--sfg_hidden_units", "16", "8"]
    )
    assert log["model_config"]["use_sfg"] is True
    assert "sfg_loss" in log["history"]


def test_preprocess_roundtrip(criteo_file, tmp_path):
    """Persisted preprocessors reproduce the training-time transform."""
    import pickle

    from xdeepfm_tpu.cli.xdftrain import main
    from xdeepfm_tpu.data import prepare_features, read_criteo_like

    out = str(tmp_path / "out_pp")
    main(_common_args(criteo_file, out))
    with open(os.path.join(out, "preprocess.pkl"), "rb") as f:
        pp = pickle.load(f)
    df = read_criteo_like(criteo_file)
    dfp, _, _ = prepare_features(
        df, pp["sparse_features"], pp["dense_features"],
        encoders=pp["encoders"], scaler=pp["scaler"],
    )
    assert dfp["C1"].dtype == np.int64
    assert (dfp[pp["dense_features"]].values >= 0).all()
    assert (dfp[pp["dense_features"]].values <= 1.0 + 1e-6).all()


def test_safe_label_encoder_unknown():
    import pandas as pd

    from xdeepfm_tpu.data import SafeLabelEncoder

    le = SafeLabelEncoder.fit(pd.Series(["a", "b", "c", "a"]))
    out = le.transform(pd.Series(["b", "zzz", "a"]))
    assert out.tolist() == [2, 0, 1]


def test_xdftrain_streaming_eval(criteo_file, tmp_path):
    """--streaming: out-of-core preprocessor fit + fit_stream training path
    produces the same artifact set and sane metrics."""
    from xdeepfm_tpu.cli.xdftrain import main

    out = str(tmp_path / "out_stream")
    log = main(
        [
            "--data_path", criteo_file, "--eval_path", criteo_file,
            "--out_dir", out, "--mode", "eval", "--epochs", "1",
            "--batch_size", "128", "--embedding_dim", "4", "--verbose", "0",
            "--streaming", "--stream_chunksize", "100",
        ]
    )
    for artifact in (
        "history.json",
        "preprocess.pkl",
        "training_log.json",
        "xdeepfm_best.weights",
        "xdeepfm_weights.bin",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    assert 0.0 <= log["results"]["eval_auc"] <= 1.0
    assert log["data_info"]["train_samples"] == 400


def test_xdftrain_streaming_native_eval(criteo_file, tmp_path):
    """--streaming --use_native_parser: out-of-core through the C++ parser."""
    import pytest

    from xdeepfm_tpu import native
    from xdeepfm_tpu.cli.xdftrain import main

    if not native.available():
        pytest.skip("native parser unavailable")
    out = str(tmp_path / "out_stream_native")
    log = main(
        [
            "--data_path", criteo_file, "--eval_path", criteo_file,
            "--out_dir", out, "--mode", "eval", "--epochs", "1",
            "--batch_size", "128", "--embedding_dim", "4", "--verbose", "0",
            "--streaming", "--use_native_parser",
        ]
    )
    for artifact in (
        "history.json",
        "preprocess.pkl",
        "training_log.json",
        "xdeepfm_best.weights",
        "xdeepfm_weights.bin",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    assert 0.0 <= log["results"]["eval_auc"] <= 1.0
    assert log["data_info"]["train_samples"] == 400


def test_native_stream_batches_match_pandas_stream(criteo_file):
    """iter_criteo_batches_native == pandas iter_criteo_batches on the same
    file (ids, scaled dense, labels)."""
    import pytest

    from xdeepfm_tpu import native
    from xdeepfm_tpu.data import (
        CRITEO_DENSE,
        CRITEO_SPARSE,
        fit_preprocessors_streaming,
        fit_preprocessors_streaming_native,
        iter_criteo_batches,
        iter_criteo_batches_native,
    )

    if not native.available():
        pytest.skip("native parser unavailable")
    encoders, scaler, _ = fit_preprocessors_streaming(
        criteo_file, CRITEO_SPARSE, CRITEO_DENSE, chunksize=100
    )
    parser, nscaler, _ = fit_preprocessors_streaming_native(criteo_file)
    np.testing.assert_allclose(nscaler.data_min_, scaler.data_min_)
    np.testing.assert_allclose(nscaler.data_max_, scaler.data_max_)
    a = list(iter_criteo_batches(
        criteo_file, CRITEO_SPARSE, CRITEO_DENSE, encoders, scaler, 128
    ))
    b = list(iter_criteo_batches_native(criteo_file, parser, nscaler, 128))
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(ya.reshape(-1), yb.reshape(-1))
        for name in CRITEO_SPARSE:
            np.testing.assert_array_equal(xa[name], xb[name], err_msg=name)
        for name in CRITEO_DENSE:
            np.testing.assert_allclose(
                xa[name], xb[name], rtol=1e-6, atol=1e-6, err_msg=name
            )


def test_native_stream_shuffle_buffer_yields_each_row_once(criteo_file):
    import pytest

    from xdeepfm_tpu import native
    from xdeepfm_tpu.data import (
        fit_preprocessors_streaming_native,
        iter_criteo_batches_native,
    )

    if not native.available():
        pytest.skip("native parser unavailable")
    parser, scaler, stats = fit_preprocessors_streaming_native(criteo_file)
    plain = list(iter_criteo_batches_native(criteo_file, parser, scaler, 64))
    shuf = list(iter_criteo_batches_native(
        criteo_file, parser, scaler, 64, shuffle_buffer=150, seed=3
    ))
    assert sum(len(y) for _, y in plain) == sum(len(y) for _, y in shuf)

    def signature(batches):
        # row-identity multiset via the full id vector + label
        rows = []
        for x, y in batches:
            mat = np.stack([x[f"C{i}"] for i in range(1, 27)], axis=1)
            for r in range(len(y)):
                rows.append(tuple(mat[r]) + (float(y[r]),))
        return sorted(rows)

    assert signature(plain) == signature(shuf)  # same rows, exactly once
    first_plain = [float(y[0]) for _, y in plain]
    first_shuf = [float(y[0]) for _, y in shuf]
    assert first_plain != first_shuf or any(
        not np.array_equal(a[0]["C1"], b[0]["C1"])
        for a, b in zip(plain, shuf)
    )  # order actually changed


def test_xdftrain_streaming_eval_requires_eval_path(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain import main

    with pytest.raises(SystemExit):
        main(
            [
                "--data_path", criteo_file,
                "--out_dir", str(tmp_path / "o"), "--mode", "eval",
                "--epochs", "1", "--verbose", "0", "--streaming",
            ]
        )


def test_xdftrain_streaming_final(criteo_file, tmp_path):
    from xdeepfm_tpu.cli.xdftrain import main

    out = str(tmp_path / "out_stream_final")
    main(
        [
            "--data_path", criteo_file, "--out_dir", out, "--mode", "final",
            "--epochs", "1", "--batch_size", "128", "--embedding_dim", "4",
            "--verbose", "0", "--streaming", "--stream_chunksize", "100",
        ]
    )
    for artifact in (
        "history_full.json",
        "preprocess.pkl",
        "training_log_full.json",
        "xdeepfm_full_weights.bin",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    with open(os.path.join(out, "training_log_full.json")) as f:
        saved = json.load(f)
    assert saved["data_info"]["total_samples"] == 400


def test_xdftrain_pro_headerless_and_39col_test(tmp_path):
    """Pro reader variant end-to-end (xdftrain_pro.py:123-190, 225-250): a
    HEADERLESS labeled train file (with one non-numeric dense cell) plus a
    39-column unlabeled --test_path file must both parse; an unlabeled file
    as --data_path must be rejected."""
    import pytest

    from xdeepfm_tpu.cli.xdftrain_pro import main

    rng = np.random.default_rng(3)
    train = tmp_path / "train_headerless.txt"
    with open(train, "w") as f:
        for i in range(300):
            dense = [f"{rng.uniform(0, 10):.2f}" for _ in range(13)]
            if i == 11:
                dense[5] = "n/a"  # pro coerces garbage dense to 0
            sparse = [f"c{rng.integers(0, 12)}" for _ in range(26)]
            label = int(rng.uniform() < 0.4)
            f.write("\t".join([str(label)] + dense + sparse) + "\n")
    test = tmp_path / "test39.txt"
    with open(test, "w") as f:
        for _ in range(40):
            dense = [f"{rng.uniform(0, 10):.2f}" for _ in range(13)]
            sparse = [f"c{rng.integers(0, 12)}" for _ in range(26)]
            f.write("\t".join(dense + sparse) + "\n")

    out = str(tmp_path / "out_pro_headerless")
    log = main(
        [
            "--data_path", str(train), "--test_path", str(test),
            "--out_dir", out, "--mode", "eval", "--epochs", "1",
            "--batch_size", "64", "--embedding_dim", "4", "--verbose", "0",
            "--sfg_hidden_units", "8",
        ]
    )
    assert log["data_info"]["train_samples"] == 270
    assert os.path.exists(os.path.join(out, "test_predictions.csv"))
    with open(os.path.join(out, "test_predictions.csv")) as f:
        assert len(f.read().splitlines()) == 41  # header + 40 rows

    # unlabeled data as the labeled input -> hard error, as the reference
    with pytest.raises(ValueError):
        main(
            [
                "--data_path", str(test), "--out_dir",
                str(tmp_path / "bad"), "--mode", "eval", "--epochs", "1",
                "--batch_size", "64", "--verbose", "0",
            ]
        )
