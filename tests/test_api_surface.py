"""Every public symbol of the reference package has a named counterpart here
(SURVEY.md §2 inventory; thin reference-named shims live beside the TPU-native
APIs they delegate to)."""

import importlib

import numpy as np
import jax.numpy as jnp

REFERENCE_PUBLIC_SYMBOLS = [
    # inputs.py
    "SparseFeat", "VarLenSparseFeat", "DenseFeat", "get_feature_names",
    "build_input_features", "combined_dnn_input", "get_varlen_pooling_list",
    "create_embedding_matrix", "embedding_lookup", "varlen_embedding_lookup",
    "get_dense_input", "maxlen_lookup",
    # layers/
    "Dice", "Identity", "activation_layer",
    "MultiHeadSelfAttention", "AttentionPooling", "CINAttention",
    "CINAttentionV2",
    "LocalActivationUnit", "DNN", "PredictionLayer", "Conv2dSame",
    "FM", "BiInteractionPooling", "SENETLayer", "BilinearInteraction", "CIN",
    "AFMLayer", "InteractingLayer", "CrossNet", "CrossNetMix",
    "InnerProductLayer", "OutterProductLayer", "ConvLayer",
    "LogTransformLayer",
    "SequencePoolingLayer", "AttentionSequencePoolingLayer", "KMaxPooling",
    "AGRUCell", "AUGRUCell", "DynamicGRU",
    # engine / callbacks / utils
    "BaseModel", "ModelCheckpoint", "EarlyStopping", "History",
    "check_version",
    # model zoo
    "AFM", "AFN", "AutoInt", "CCPM", "DCN", "DCNMix", "DeepFM", "DIEN",
    "DIFM", "DIN", "FiBiNET", "IFM", "MLR", "ESMM", "MMOE", "PLE",
    "SharedBottom", "NFM", "ONN", "PNN", "WDL", "xDeepFM",
    "xDeepFMAttention", "xDeepFMAttentionV2",
    # xdeepfm_pro/
    "AutoDisLayer", "DenseFeatureEncoder", "SFGDecoder", "LabelAwareAttention",
    "SFGLoss", "xDeepFMPro", "xDeepFMProLight",
]

MODULES = [
    "xdeepfm_tpu", "xdeepfm_tpu.features", "xdeepfm_tpu.embeddings",
    "xdeepfm_tpu.models", "xdeepfm_tpu.nn", "xdeepfm_tpu.pro",
    "xdeepfm_tpu.callbacks", "xdeepfm_tpu.utils", "xdeepfm_tpu.basemodel",
    "xdeepfm_tpu.nn.activations", "xdeepfm_tpu.nn.core",
    "xdeepfm_tpu.nn.interaction", "xdeepfm_tpu.nn.sequence",
    "xdeepfm_tpu.nn.cin_attention",
]


def test_reference_surface_covered():
    mods = [importlib.import_module(m) for m in MODULES]
    missing = [
        n for n in REFERENCE_PUBLIC_SYMBOLS
        if not any(hasattr(m, n) for m in mods)
    ]
    assert not missing, f"reference symbols without a counterpart: {missing}"


def test_build_input_features_reference_slices():
    """Exact slice map of ``inputs.py:99-123``."""
    from xdeepfm_tpu.features import (
        DenseFeat,
        SparseFeat,
        VarLenSparseFeat,
        build_input_features,
    )

    cols = [
        SparseFeat("C0", 10, 4),
        DenseFeat("I0", 2),
        VarLenSparseFeat(
            SparseFeat("h", 10, 4), maxlen=3, combiner="mean",
            length_name="hl",
        ),
        SparseFeat("C0", 10, 4),  # duplicate skipped, like the reference
    ]
    assert build_input_features(cols) == {
        "C0": (0, 1),
        "I0": (1, 3),
        "h": (3, 6),
        "hl": (6, 7),
    }


def test_reference_named_lookup_helpers(rng):
    """The inputs.py-named wrappers delegate to EmbeddingCollection."""
    import flax.linen as nn
    import jax

    from xdeepfm_tpu.features import (
        DenseFeat, FeatureSchema, SparseFeat, VarLenSparseFeat,
    )
    from xdeepfm_tpu.embeddings import (
        create_embedding_matrix, embedding_lookup, get_dense_input,
        get_varlen_pooling_list, maxlen_lookup, varlen_embedding_lookup,
    )

    cols = [
        SparseFeat("C0", 10, 4),
        DenseFeat("I0", 2),
        VarLenSparseFeat(
            SparseFeat("h", 10, 4), maxlen=3, combiner="mean",
            length_name="hl",
        ),
    ]
    schema = FeatureSchema.build(cols)
    batch = {
        "sparse": jnp.asarray(rng.integers(0, 10, (4, 1)).astype(np.int32)),
        "dense": jnp.asarray(rng.uniform(0, 1, (4, 2)).astype(np.float32)),
        "vl_h": jnp.asarray(rng.integers(0, 10, (4, 3)).astype(np.int32)),
        "len_hl": jnp.full((4, 1), 2, jnp.int32),
    }

    class Wrap(nn.Module):
        def setup(self):
            self.emb = create_embedding_matrix(cols)

        def __call__(self, b):
            return (
                embedding_lookup(b, self.emb, [cols[0]], to_list=True)[0],
                varlen_embedding_lookup(b, self.emb, [cols[2]])["h"],
                get_varlen_pooling_list(b, self.emb, [cols[2]])[0],
            )

    w = Wrap()
    vs = w.init(jax.random.PRNGKey(0), batch)
    e, seq, pooled = w.apply(vs, batch)
    assert e.shape == (4, 1, 4)
    assert seq.shape == (4, 3, 4)
    assert pooled.shape == (4, 1, 4)
    assert [d.shape for d in get_dense_input(batch, schema, cols)] == [(4, 2)]
    assert maxlen_lookup(batch, ["hl"]).shape == (4, 1)
