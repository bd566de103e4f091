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


@pytest.mark.parametrize("G,S,h,dh", [(4, 16, 1, 5), (6, 24, 2, 8)])
def test_forward_matches_xla(rng, G, S, h, dh):
    q = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, S, h * dh)).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)
    out = jnp.concatenate(
        [
            ap.small_attention(
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
            ap.small_attention(
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
