"""Embedding machinery: shared tables, auto dim, groups, varlen masking."""

import numpy as np
import jax
import jax.numpy as jnp

from xdeepfm_tpu.embeddings import EmbeddingCollection, LinearModel
from xdeepfm_tpu.features import (
    DenseFeat,
    FeatureSchema,
    SparseFeat,
    VarLenSparseFeat,
)


def test_shared_embedding_name():
    """Two features with the same embedding_name index the same rows
    (inputs.py:27-28 semantics)."""
    cols = (
        SparseFeat("a", 10, 4, embedding_name="shared"),
        SparseFeat("b", 10, 4, embedding_name="shared"),
    )
    schema = FeatureSchema.build(cols)
    emb = EmbeddingCollection(feature_columns=cols, schema=schema)
    batch = {"sparse": jnp.asarray([[3, 3], [7, 2]], jnp.int32)}
    variables = emb.init(jax.random.PRNGKey(0), batch, method=emb.stacked_sparse,
                         feats=cols)
    out = emb.apply(variables, batch, cols, method=emb.stacked_sparse)
    # same id via either feature -> same vector
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))
    assert not np.allclose(np.asarray(out[1, 0]), np.asarray(out[1, 1]))
    # only ONE table exists
    params = variables["params"]
    assert list(params.keys()) == ["table_d4"]
    assert params["table_d4"].shape == (10, 4)


def test_auto_embedding_dim():
    f = SparseFeat("x", vocabulary_size=10000, embedding_dim="auto")
    assert f.embedding_dim == 6 * int(10000**0.25)


def test_grouped_sparse():
    cols = (
        SparseFeat("a", 5, 4, group_name="g1"),
        SparseFeat("b", 5, 4, group_name="g2"),
        SparseFeat("c", 5, 4, group_name="g1"),
    )
    schema = FeatureSchema.build(cols)
    emb = EmbeddingCollection(feature_columns=cols, schema=schema)
    batch = {"sparse": jnp.zeros((2, 3), jnp.int32)}
    variables = emb.init(
        jax.random.PRNGKey(0), batch, cols, method=emb.grouped_sparse
    )
    groups = emb.apply(variables, batch, cols, method=emb.grouped_sparse)
    assert set(groups.keys()) == {"g1", "g2"}
    assert len(groups["g1"]) == 2 and len(groups["g2"]) == 1


def test_varlen_mask_from_zero_ids(rng):
    """Without length_name, mask = (id != 0) (inputs.py:146)."""
    vl = VarLenSparseFeat(SparseFeat("hist", 10, 4), maxlen=4, combiner="sum")
    cols = (vl,)
    schema = FeatureSchema.build(cols)
    emb = EmbeddingCollection(feature_columns=cols, schema=schema)
    ids = jnp.asarray([[1, 2, 0, 0], [3, 0, 0, 0]], jnp.int32)
    batch = {"vl_hist": ids}
    variables = emb.init(
        jax.random.PRNGKey(0), batch, vl, method=emb.lookup_varlen_pooled
    )
    pooled = emb.apply(variables, batch, vl, method=emb.lookup_varlen_pooled)
    table = np.asarray(variables["params"]["table_d4"])
    np.testing.assert_allclose(
        np.asarray(pooled[0, 0]), table[1] + table[2], rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pooled[1, 0]), table[3], rtol=1e-5)


def test_linear_model_refine_weight(rng):
    cols = (
        SparseFeat("a", 5, 4),
        SparseFeat("b", 5, 4),
        DenseFeat("d", 1),
    )
    schema = FeatureSchema.build(cols)
    lm = LinearModel(feature_columns=cols, schema=schema)
    batch = {
        "sparse": jnp.asarray([[1, 2]], jnp.int32),
        "dense": jnp.asarray([[0.5]], jnp.float32),
    }
    variables = lm.init(jax.random.PRNGKey(0), batch)
    base = lm.apply(variables, batch)
    # doubling sparse contributions via refine weights: logit' - dense_part
    # == 2 * (logit - dense_part)
    refined = lm.apply(
        variables, batch, sparse_feat_refine_weight=jnp.asarray([[2.0, 2.0]])
    )
    p = variables["params"]
    dense_part = 0.5 * np.asarray(p["weight"])[0, 0]
    np.testing.assert_allclose(
        float(refined[0, 0]) - dense_part,
        2 * (float(base[0, 0]) - dense_part),
        rtol=1e-5,
    )


def test_fast_inputs_matches_embed_inputs():
    """fast_inputs (one stacked gather) must equal embed_inputs (per-feature
    list) after concatenation — uniform dims, varlen, and dense."""
    rng = np.random.default_rng(3)
    cols = (
        SparseFeat("a", 9, 4),
        SparseFeat("b", 11, 4),
        DenseFeat("d", 2),
        VarLenSparseFeat(SparseFeat("h", 9, 4, embedding_name="a"),
                         maxlen=3),
    )
    schema = FeatureSchema.build(cols)
    emb = EmbeddingCollection(feature_columns=cols, schema=schema)
    batch = {
        "sparse": jnp.asarray(rng.integers(0, 9, (5, 2)), jnp.int32),
        "dense": jnp.asarray(rng.uniform(0, 1, (5, 2)).astype(np.float32)),
        "vl_h": jnp.asarray(rng.integers(0, 9, (5, 3)), jnp.int32),
    }
    variables = emb.init(jax.random.PRNGKey(0), batch, method=emb.embed_inputs)
    sl, dl = emb.apply(variables, batch, method=emb.embed_inputs)
    fl, fdl = emb.apply(variables, batch, method=emb.fast_inputs)
    want = np.concatenate([np.asarray(e) for e in sl], axis=1)
    got = np.concatenate([np.asarray(e) for e in fl], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(e) for e in fdl], axis=1),
        np.concatenate([np.asarray(e) for e in dl], axis=1),
    )


def test_fast_inputs_mixed_dims_falls_back():
    """Mixed embedding dims route through the per-feature path."""
    rng = np.random.default_rng(4)
    cols = (SparseFeat("a", 9, 4), SparseFeat("b", 11, 6))
    schema = FeatureSchema.build(cols)
    emb = EmbeddingCollection(feature_columns=cols, schema=schema)
    batch = {"sparse": jnp.asarray(rng.integers(0, 9, (5, 2)), jnp.int32)}
    variables = emb.init(jax.random.PRNGKey(0), batch, method=emb.embed_inputs)
    sl, _ = emb.apply(variables, batch, method=emb.embed_inputs)
    fl, _ = emb.apply(variables, batch, method=emb.fast_inputs)
    assert len(fl) == len(sl)
    for a, b in zip(fl, sl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_multi_linear_matches_n_linear_models():
    """MultiLinearModel == N independent LinearModels with the same params."""
    from xdeepfm_tpu.embeddings import MultiLinearModel

    rng = np.random.default_rng(5)
    cols = (SparseFeat("a", 9, 4), SparseFeat("b", 11, 4), DenseFeat("d", 2))
    schema = FeatureSchema.build(cols)
    ml = MultiLinearModel(feature_columns=cols, schema=schema, n_outputs=3)
    batch = {
        "sparse": jnp.asarray(rng.integers(0, 9, (6, 2)), jnp.int32),
        "dense": jnp.asarray(rng.uniform(0, 1, (6, 2)).astype(np.float32)),
    }
    variables = ml.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(ml.apply(variables, batch))  # [6, 3]
    # column k of the stacked table/weight == an independent 1-dim model
    table = np.asarray(variables["params"]["embedding_dict"]["table_d3"])
    weight = np.asarray(variables["params"]["weight"])
    ids = np.asarray(batch["sparse"])
    dense = np.asarray(batch["dense"])
    offs = {"a": 0, "b": 9}
    for k in range(3):
        want = (
            table[ids[:, 0] + offs["a"], k]
            + table[ids[:, 1] + offs["b"], k]
            + dense @ weight[:, k]
        )
        np.testing.assert_allclose(out[:, k], want, rtol=1e-5)


def test_onn_second_order_oracle():
    """ONN's feature-grouped pair tables reproduce explicit per-pair
    lookups: pair (i, j) reads column block of emb1_f{i} at position
    (# of pairs (i, j') with j' < j) and of emb2_f{j} at position i."""
    from xdeepfm_tpu.models.onn import ONNModule

    rng = np.random.default_rng(6)
    F, E, vocab, B = 4, 3, 7, 5
    cols = tuple(SparseFeat(f"C{i}", vocab, embedding_dim=E) for i in range(F))
    schema = FeatureSchema.build(cols)
    mod = ONNModule(linear_cols=cols, dnn_cols=cols, schema=schema,
                    embedding_size=E, dnn_hidden_units=(4,))
    batch = {"sparse": jnp.asarray(rng.integers(0, vocab, (B, F)), jnp.int32)}
    variables = mod.init(jax.random.PRNGKey(0), batch)

    # reach into the module to get the concatenated second-order input by
    # re-running the forward up to the DNN: easiest is to recompute it here
    params = variables["params"]
    ids = np.asarray(batch["sparse"])
    pairs = [(i, j) for i in range(F - 1) for j in range(i + 1, F)]
    expected = []
    for p, (i, j) in enumerate(pairs):
        e1 = np.asarray(params[f"second_order_emb1_f{i}"])  # [vocab, n1*E]
        e2 = np.asarray(params[f"second_order_emb2_f{j}"])  # [vocab, n2*E]
        pos1 = j - i - 1          # index of (i, j) among (i, j' > i)
        pos2 = i                  # index of (i, j) among (i' < j, j)
        v1 = e1[ids[:, i], pos1 * E : (pos1 + 1) * E]
        v2 = e2[ids[:, j], pos2 * E : (pos2 + 1) * E]
        expected.append(v1 * v2)
    expected = np.concatenate(expected, axis=1)  # [B, P*E], pair-major

    # capture the DNN input via a forward with a tiny hook: the DNN input's
    # first P*E columns are the second-order block
    captured = {}

    import xdeepfm_tpu.nn.core as core_mod

    class SpyDNN(core_mod.DNN):
        def __call__(self, x, training=False):
            captured["dnn_in"] = x
            return super().__call__(x, training=training)

    import xdeepfm_tpu.models.onn as onn_mod
    old_dnn = onn_mod.DNN
    onn_mod.DNN = SpyDNN
    try:
        mod2 = ONNModule(linear_cols=cols, dnn_cols=cols, schema=schema,
                         embedding_size=E, dnn_hidden_units=(4,))
        mod2.apply(variables, batch)
    finally:
        onn_mod.DNN = old_dnn
    got = np.asarray(captured["dnn_in"])[:, : expected.shape[1]]
    np.testing.assert_allclose(got, expected, rtol=1e-6)
