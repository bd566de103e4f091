"""Golden-value tests for the op library vs numpy oracles mirroring the
reference math (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.nn.interaction import (
    CIN,
    FM,
    BiInteractionPooling,
    CrossNet,
    InteractingLayer,
)
from xdeepfm_tpu.nn.core import DNN, PredictionLayer
from xdeepfm_tpu.ops.cin import cin_layer_contract


def test_fm_oracle(rng):
    x = rng.normal(size=(7, 5, 4)).astype(np.float32)
    out = FM().apply({}, jnp.asarray(x))
    # oracle: 0.5 * sum_d ((sum_f x)^2 - sum_f x^2)
    expect = 0.5 * ((x.sum(1) ** 2 - (x**2).sum(1)).sum(-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_bi_interaction_shape(rng):
    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    out = BiInteractionPooling().apply({}, jnp.asarray(x))
    assert out.shape == (3, 1, 4)
    fm = FM().apply({}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out).sum(-1).reshape(-1), np.asarray(fm).reshape(-1), rtol=1e-5
    )


def _cin_oracle(x, kernels, biases, layer_size, split_half):
    """NumPy oracle mirroring interaction.py:207-248."""
    B, m, D = x.shape
    hidden = [x]
    finals = []
    for i, size in enumerate(layer_size):
        h = hidden[-1]
        z = np.einsum("bhd,bmd->bhmd", h, x).reshape(B, h.shape[1] * m, D)
        W = kernels[i]  # [O, C]
        out = np.einsum("oc,bcd->bod", W, z) + biases[i][None, :, None]
        out = np.maximum(out, 0)  # relu
        if split_half:
            if i != len(layer_size) - 1:
                nxt, direct = out[:, : size // 2], out[:, size // 2 :]
            else:
                nxt, direct = None, out
        else:
            nxt, direct = out, out
        finals.append(direct)
        hidden.append(nxt)
    return np.concatenate(finals, axis=1).sum(-1)


@pytest.mark.parametrize("split_half", [True, False])
def test_cin_oracle(rng, split_half):
    B, m, D = 5, 6, 4
    layer_size = (8, 6)
    x = rng.normal(size=(B, m, D)).astype(np.float32)
    cin = CIN(field_size=m, layer_size=layer_size, split_half=split_half)
    params = cin.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = cin.apply({"params": params}, jnp.asarray(x))
    kernels = [np.asarray(params[f"conv_w_{i}"]) for i in range(len(layer_size))]
    biases = [np.asarray(params[f"conv_b_{i}"]) for i in range(len(layer_size))]
    expect = _cin_oracle(x, kernels, biases, layer_size, split_half)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)
    fm_num = sum(layer_size[:-1]) // 2 + layer_size[-1] if split_half else sum(
        layer_size
    )
    assert out.shape == (B, fm_num)


def test_cin_backends_agree(rng):
    B, H, M, D, O = 4, 6, 5, 8, 10
    h = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(O, H * M)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    out_xla = cin_layer_contract(h, x0, W, b, backend="xla")
    out_fused = cin_layer_contract(h, x0, W, b, backend="fused")
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_fused), rtol=1e-4, atol=1e-5
    )


def test_dnn_shapes_and_dropout(rng):
    x = jnp.asarray(rng.normal(size=(6, 10)).astype(np.float32))
    dnn = DNN(inputs_dim=10, hidden_units=(16, 8), dropout_rate=0.5)
    variables = dnn.init(jax.random.PRNGKey(0), x)
    out = dnn.apply(variables, x)  # eval mode, no dropout rng needed
    assert out.shape == (6, 8)
    out2 = dnn.apply(
        variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out2.shape == (6, 8)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_dnn_use_bn_mutable(rng):
    x = jnp.asarray(rng.normal(size=(6, 10)).astype(np.float32))
    dnn = DNN(inputs_dim=10, hidden_units=(4,), use_bn=True)
    variables = dnn.init(jax.random.PRNGKey(0), x, training=True)
    out, mutated = dnn.apply(
        variables,
        x,
        training=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (6, 4)
    assert "batch_stats" in mutated


def test_prediction_layer():
    x = jnp.asarray([[0.0], [2.0]])
    pl_mod = PredictionLayer(task="binary")
    variables = pl_mod.init(jax.random.PRNGKey(0), x)
    out = pl_mod.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out), 1 / (1 + np.exp(-np.asarray(x))), rtol=1e-5
    )
    reg = PredictionLayer(task="regression")
    vr = reg.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(reg.apply(vr, x)), np.asarray(x))


def test_crossnet_identity_structure(rng):
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    for param in ("vector", "matrix"):
        cn = CrossNet(in_features=8, layer_num=2, parameterization=param)
        variables = cn.init(jax.random.PRNGKey(0), x)
        out = cn.apply(variables, x)
        assert out.shape == (3, 8)


def test_interacting_layer(rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 8)).astype(np.float32))
    layer = InteractingLayer(embedding_size=8, head_num=2)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (3, 5, 8)
    assert np.all(np.asarray(out) >= 0)  # final relu


def test_kmax_lastaxis_matches_topk(rng):
    from xdeepfm_tpu.nn.sequence import kmax_lastaxis

    x = jnp.asarray(rng.normal(size=(4, 6, 26)).astype(np.float32))
    for k in (1, 3, 13, 26):
        got = kmax_lastaxis(x, k)
        want = jax.lax.top_k(x, k)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        # gradients scatter to the selected positions, like top_k's VJP
        g_got = jax.grad(lambda a: jnp.sum(kmax_lastaxis(a, k) ** 2))(x)
        g_want = jax.grad(lambda a: jnp.sum(jax.lax.top_k(a, k)[0] ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want))


def test_kmax_lastaxis_ties_keep_duplicates(rng):
    from xdeepfm_tpu.nn.sequence import kmax_lastaxis

    x = jnp.asarray(np.array([[5.0, 1.0, 5.0, 3.0]], np.float32))
    got = np.asarray(kmax_lastaxis(x, 3))
    np.testing.assert_allclose(got, np.array([[5.0, 5.0, 3.0]], np.float32))


def test_onn_column_permutation_matches_3d_permute():
    """The compact 2-D column-gather pair alignment in ONN equals the naive
    [B, P, E] axis-1 permutation it replaced (reference pair order,
    ``deepctr/models/onn.py:122-137``)."""
    import numpy as np

    from xdeepfm_tpu.features import DenseFeat, SparseFeat
    from xdeepfm_tpu.models import ONN

    rng = np.random.default_rng(0)
    n, F, vocab, E = 64, 5, 12, 4
    x = {f"C{i}": rng.integers(0, vocab, n) for i in range(F)}
    x["I0"] = rng.uniform(0, 1, n).astype(np.float32)
    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=E) for i in range(F)] + [
        DenseFeat("I0", 1)
    ]
    m = ONN(cols, cols, dnn_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy", metrics=[])
    batch = {k: jnp.asarray(v) for k, v in m.schema.pack(x).items()}
    mod = m.module

    # recompute second_order both ways from the model's own params
    import flax

    p = m.params
    sp = [f for f in cols if isinstance(f, SparseFeat)]
    pairs = [(i, j) for i in range(F - 1) for j in range(i + 1, F)]
    P = len(pairs)
    parts1, parts2 = [], []
    for k, f in enumerate(sp):
        ids = np.asarray(x[f.name])
        if f"second_order_emb1_f{k}" in p:
            parts1.append(np.asarray(p[f"second_order_emb1_f{k}"])[ids])
        if f"second_order_emb2_f{k}" in p:
            parts2.append(np.asarray(p[f"second_order_emb2_f{k}"])[ids])
    emb1 = np.concatenate(parts1, axis=1).reshape(n, P, E)
    emb2 = np.concatenate(parts2, axis=1).reshape(n, P, E)
    second_major = sorted(range(P), key=lambda q: (pairs[q][1], pairs[q][0]))
    perm = np.empty(P, dtype=np.int32)
    perm[np.array(second_major)] = np.arange(P)
    want = (emb1 * emb2[:, perm, :]).reshape(n, -1)

    e1 = jnp.concatenate([jnp.asarray(a) for a in parts1], axis=1)
    e2 = jnp.concatenate([jnp.asarray(a) for a in parts2], axis=1)
    cols_idx = (perm[:, None] * E + np.arange(E)[None, :]).reshape(-1)
    got = np.asarray(e1 * jnp.take(e2, jnp.asarray(cols_idx), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # and the model trains end-to-end with the new path
    y = (rng.uniform(size=n) < 0.4).astype(np.float32)
    h = m.fit(x, y, batch_size=32, epochs=2, verbose=0)
    assert np.isfinite(h.history["loss"]).all()
