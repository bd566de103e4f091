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
