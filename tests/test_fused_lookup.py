"""Dense fused table lookup: one combined gather/scatter per same-layout
table group (embeddings.fused_gather + compile(fused_lookup=...)) must be
numerically equivalent to the per-table path."""

import numpy as np

from xdeepfm_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat
from xdeepfm_tpu.models import DIN, xDeepFM


def _data(n=256, vocab=64, seed=0, maxlen=5):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(4)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    x["hist_C0"] = rng.integers(0, vocab, (n, maxlen))
    y = (x["C0"] % 2).astype(np.float32)
    cols = (
        [SparseFeat(f"C{i}", vocab, 8) for i in range(4)]
        + [DenseFeat("I0")]
        + [VarLenSparseFeat(SparseFeat("hist_C0", vocab, 8), maxlen=maxlen,
                            combiner="mean")]
    )
    return x, y, cols


def _train(fused, steps=6):
    x, y, cols = _data()
    m = xDeepFM(cols, cols, dnn_hidden_units=(16,), cin_layer_size=(8,),
                seed=7)
    m.compile("adam", "binary_crossentropy", metrics=[], fused_lookup=fused)
    if fused is True:
        assert m._fused_dense_groups, "expected a fusable table group"
        # main table_d8 + linear table_d1 share the id pattern
        (entries, paths), = m._fused_dense_groups
        assert set(paths) == {
            "embedding_dict/table_d8",
            "linear_model/embedding_dict/table_d1",
        }
    m.fit(x, y, batch_size=64, epochs=2, verbose=0, shuffle=False)
    return m


def test_fused_matches_unfused_params():
    a = _train(False)
    b = _train(True)
    flat_a = {k: np.asarray(v) for k, v in _flatten(a.params).items()}
    flat_b = {k: np.asarray(v) for k, v in _flatten(b.params).items()}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            flat_a[k], flat_b[k], rtol=2e-3, atol=1e-6, err_msg=k
        )


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def test_fused_gather_grads_exact():
    """fused_gather's custom backward == autodiff through separate takes."""
    import jax
    import jax.numpy as jnp

    from xdeepfm_tpu.embeddings import fused_gather

    rng = np.random.default_rng(1)
    rows, n = 50, 40
    t3 = jnp.asarray(rng.normal(size=(rows, 3)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(rows, 1)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    r = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

    def fused_loss(t3, t1):
        occ = fused_gather((rows, (3, 1)), (t3, t1), ids)
        return jnp.sum(occ * r)

    def sep_loss(t3, t1):
        g = jnp.concatenate(
            [jnp.take(t3, ids, axis=0), jnp.take(t1, ids, axis=0)], axis=1
        )
        return jnp.sum(g * r)

    va, ga = jax.value_and_grad(fused_loss, argnums=(0, 1))(t3, t1)
    vb, gb = jax.value_and_grad(sep_loss, argnums=(0, 1))(t3, t1)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for x, z in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-5,
                                   atol=1e-6)


def test_fused_predict_matches_unfused():
    x, y, cols = _data()
    a = _train(False)
    b = _train(True)
    # align weights so only the lookup path differs
    b.set_weights(a.get_weights())
    pa = a.predict(x, 64)
    pb = b.predict(x, 64)
    np.testing.assert_allclose(pa, pb, rtol=1e-6, atol=1e-7)


def test_no_fusion_when_layouts_differ():
    """DIN has no linear model — nothing to fuse; compile must not group.
    (Round 4 measured the singleton varlen-group alternative as a
    regression — see _build_fused_groups' negative-result note.)"""
    x, y, cols = _data()
    cols = cols[:-1] + [
        VarLenSparseFeat(SparseFeat("hist_C0", 64, 8), maxlen=5,
                         combiner="mean", length_name="seq_len")
    ]
    x["seq_len"] = np.full((len(y), 1), 3, np.int32)
    m = DIN(cols, ["C0"], dnn_hidden_units=(8,), seed=3)
    m.compile("adam", "binary_crossentropy", metrics=[], fused_lookup=True)
    assert m._fused_dense_groups == []
    m.fit(x, y, batch_size=64, epochs=1, verbose=0)


def test_fused_fit_stream_matches_fit():
    x, y, cols = _data()
    m1 = xDeepFM(cols, cols, dnn_hidden_units=(16,), cin_layer_size=(8,),
                 seed=7)
    m1.compile("adam", "binary_crossentropy", metrics=[], fused_lookup=True)
    m1.fit(x, y, batch_size=64, epochs=1, verbose=0, shuffle=False)
    m2 = xDeepFM(cols, cols, dnn_hidden_units=(16,), cin_layer_size=(8,),
                 seed=7)
    m2.compile("adam", "binary_crossentropy", metrics=[], fused_lookup=True)

    def gen():
        for s in range(0, len(y), 64):
            yield ({k: v[s : s + 64] for k, v in x.items()}, y[s : s + 64])

    m2.fit_stream(gen(), verbose=0)
    a, b = _flatten(m1.params), _flatten(m2.params)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)


def test_fused_auto_disabled_on_multidevice():
    """conftest forces 8 virtual CPU devices -> 'auto' must stay off."""
    x, y, cols = _data()
    m = xDeepFM(cols, cols, dnn_hidden_units=(8,), cin_layer_size=(8,), seed=3)
    m.compile("adam", "binary_crossentropy", metrics=[])
    assert m._fused_dense_groups == []
