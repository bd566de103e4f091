"""Fused small-attention kernel vs XLA (forward + grads), interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.ops import attention_pallas as ap


@pytest.fixture(autouse=True)
def interpret_mode():
    ap.set_interpret(True)
    yield
    ap.set_interpret(False)


def _xla_attn(q, k, v, scale):
    s = jnp.einsum("gsk,gtk->gst", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gst,gtk->gsk", p, v)


def _sa(q, k, v, scale):
    """[G, S, dh] convenience wrapper over the dh-major kernel contract."""
    t = lambda x: jnp.swapaxes(x, 1, 2)
    return t(ap.small_attention(t(q), t(k), t(v), scale))


@pytest.mark.parametrize("G,S,h,dh", [(4, 16, 1, 5), (6, 24, 2, 8)])
def test_forward_matches_xla(rng, G, S, h, dh):
    q = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)
    out = jnp.concatenate(
        [
            _sa(
                q[..., j * dh : (j + 1) * dh],
                k[..., j * dh : (j + 1) * dh],
                v[..., j * dh : (j + 1) * dh],
                scale,
            )
            for j in range(h)
        ],
        axis=-1,
    )
    expect = jnp.concatenate(
        [
            _xla_attn(q[..., j * dh : (j + 1) * dh],
                      k[..., j * dh : (j + 1) * dh],
                      v[..., j * dh : (j + 1) * dh], scale)
            for j in range(h)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4,
                               atol=1e-5)


def test_grads_match_xla(rng):
    G, S, h, dh = 3, 12, 2, 4
    q = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    scale = 0.5

    def loss_p(q, k, v):
        outs = [
            _sa(
                q[..., j * dh : (j + 1) * dh],
                k[..., j * dh : (j + 1) * dh],
                v[..., j * dh : (j + 1) * dh],
                scale,
            )
            for j in range(h)
        ]
        return jnp.sum(jnp.concatenate(outs, axis=-1) ** 2)

    def loss_x(q, k, v):
        outs = [
            _xla_attn(
                q[..., j * dh : (j + 1) * dh],
                k[..., j * dh : (j + 1) * dh],
                v[..., j * dh : (j + 1) * dh],
                scale,
            )
            for j in range(h)
        ]
        return jnp.sum(jnp.concatenate(outs, axis=-1) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, e, name in zip(gp, gx, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_mhsa_module_uses_kernel(rng):
    """CINAttention module output unchanged by the fused path."""
    from xdeepfm_tpu.nn.cin_attention import MultiHeadSelfAttention

    x = jnp.asarray(rng.normal(size=(4, 10, 8)).astype(np.float32))
    mhsa = MultiHeadSelfAttention(embed_dim=8, num_heads=2, dropout=0.0)
    variables = mhsa.init(jax.random.PRNGKey(0), x)
    out_fused = mhsa.apply(variables, x)  # interpret-mode pallas
    ap.set_interpret(False)
    out_xla = mhsa.apply(variables, x)  # cpu -> xla fallback
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=1e-4, atol=1e-5
    )


# ---- lane-batched small-S kernel (ops/lane_attention.py) -------------------


@pytest.fixture()
def lane_interpret():
    from xdeepfm_tpu.ops import lane_attention as la

    la.set_interpret(True)
    yield la
    la.set_interpret(False)


def _xla_mhsa_packed(Q, K, V, scale, heads):
    B, S, E = Q.shape
    dh = E // heads
    Qr, Kr, Vr = (x.reshape(B, S, heads, dh) for x in (Q, K, V))
    s = jnp.einsum("bshd,bthd->bhst", Qr, Kr) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", p, Vr).reshape(B, S, E)


@pytest.mark.parametrize("B,S,h,dh", [(64, 13, 2, 5), (130, 39, 2, 5),
                                      (32, 8, 1, 4)])
def test_lane_attention_matches_xla(rng, lane_interpret, B, S, h, dh):
    la = lane_interpret
    E = h * dh
    Q = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(B, S, E)).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)
    got = la.lane_mhsa_packed(Q, K, V, scale, h)
    want = _xla_mhsa_packed(Q, K, V, scale, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    f1 = lambda q, k, v: jnp.sum(jnp.sin(la.lane_mhsa_packed(q, k, v, scale, h)))
    f2 = lambda q, k, v: jnp.sum(jnp.sin(_xla_mhsa_packed(q, k, v, scale, h)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(Q, K, V)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_interacting_layer_lane_path_matches_xla(rng, lane_interpret):
    from xdeepfm_tpu.nn.interaction import InteractingLayer

    la = lane_interpret
    x = jnp.asarray(rng.normal(size=(65, 7, 8)).astype(np.float32))
    layer = InteractingLayer(embedding_size=8, head_num=2, scaling=True)
    v = layer.init(jax.random.PRNGKey(0), x)
    got = layer.apply(v, x)  # interpret fixture forces the lane path
    la.set_interpret(False)
    want = layer.apply(v, x)
    la.set_interpret(True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


# ---- fully-fused attention block (ops/attn_block_pallas.py) ----------------


@pytest.mark.parametrize(
    "cls_name,kw",
    [
        ("CINAttention", {}),
        ("CINAttention", {"use_residual": False}),
        ("CINAttention", {"use_layer_norm": False}),
        ("CINAttentionV2", {"num_attn_layers": 2}),
        ("CINAttentionV2", {"num_attn_layers": 2, "use_layer_norm": False}),
    ],
)
def test_fused_attn_block_matches_xla(rng, cls_name, kw):
    """The one-kernel attention block (q/k/v/o + residual + LN + pooling,
    interpret mode) matches the unfused XLA composition — forward AND all
    gradients (params + input)."""
    from xdeepfm_tpu.nn import cin_attention as ca
    from xdeepfm_tpu.ops import attn_block_pallas as abp

    cls = getattr(ca, cls_name)
    B, m, E = 8, 6, 10
    x = jnp.asarray(rng.normal(size=(B, m, E)).astype(np.float32))
    layer = cls(field_size=m, embedding_size=E, layer_size=(8, 6),
                num_heads=2, **kw)
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(params, xin, backend):
        abp.set_backend(backend)
        out = layer.apply({"params": params}, xin)
        return jnp.sum(out * jnp.cos(out)), out

    p = variables["params"]
    try:
        (l_ref, o_ref), g_ref = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(p, x, "xla")
        abp.set_interpret(True)
        (l_fus, o_fus), g_fus = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(p, x, "pallas")
    finally:
        abp.set_interpret(False)
        abp.set_backend("auto")

    np.testing.assert_allclose(
        np.asarray(o_fus), np.asarray(o_ref), rtol=1e-4, atol=1e-5
    )
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fus)[0]
    assert len(flat_r) == len(flat_f)
    for (kr, vr), (kf, vf) in zip(flat_r, flat_f):
        assert kr == kf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(kr),
        )


def test_pick_bt_sublane_alignment_and_padding():
    """The pair tile rides the SUBLANE axis (multiple of 8 required); the
    entry points pad G to 8, and padded rows are exact zeros."""
    import jax
    import numpy as np

    from xdeepfm_tpu.ops import attention_pallas as ap

    for G in (8, 16, 1000, 4096, 8192):
        bt = ap._pick_bt(G, 256)
        assert bt % 8 == 0 and G % bt == 0, (G, bt)

    ap.set_interpret(True)
    try:
        rng = np.random.default_rng(0)
        G, dh, S = 5, 4, 16  # G not a multiple of 8 -> padded inside
        q = jnp.asarray(rng.normal(size=(G, dh, S)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(G, dh, S)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(G, dh, S)).astype(np.float32))
        out = ap._sa_padded(q, k, v, 0.5)
        assert out.shape == (G, dh, S)
        # reference softmax attention
        s = np.einsum("gds,gdt->gst", np.asarray(q), np.asarray(k)) * 0.5
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("gst,gdt->gds", p, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
        g = jax.grad(lambda q: jnp.sum(ap._sa_padded(q, k, v, 0.5) ** 2))(q)
        assert np.isfinite(np.asarray(g)).all()
    finally:
        ap.set_interpret(False)
