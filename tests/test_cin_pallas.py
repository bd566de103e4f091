"""Fused Pallas CIN kernel vs XLA oracle (forward + gradients).

Runs in interpreter mode on the CPU test platform; the same code path runs
compiled on TPU (exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.ops.cin import cin_layer_contract
from xdeepfm_tpu.ops import cin_pallas as cp


@pytest.fixture(autouse=True)
def interpret_mode():
    cp.set_interpret(True)
    yield
    cp.set_interpret(False)


@pytest.mark.parametrize(
    "B,H,M,D,O",
    [
        (8, 16, 5, 4, 12),
        (16, 26, 26, 10, 32),  # criteo-ish layer-1 shape (scaled down)
        (4, 13, 26, 10, 8),  # split-half layer-2 (odd H)
    ],
)
def test_pallas_forward_matches_xla(rng, B, H, M, D, O):
    h = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(O, H * M)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    out_xla = cin_layer_contract(h, x0, W, b, backend="xla")
    out_pl = cp.cin_pallas(h, x0, W, b)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )


def test_pallas_grads_match_xla(rng):
    B, H, M, D, O = 4, 8, 5, 3, 6
    h = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(O, H * M)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

    def loss_xla(h, x0, W, b):
        return jnp.sum(cin_layer_contract(h, x0, W, b, backend="xla") ** 2)

    def loss_pl(h, x0, W, b):
        return jnp.sum(cp.cin_pallas(h, x0, W, b) ** 2)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(h, x0, W, b)
    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(h, x0, W, b)
    for a, e, name in zip(gp, gx, ["dh", "dx0", "dW", "db"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_cin_module_with_pallas_backend(rng):
    """Full CIN module agrees across backends."""
    from xdeepfm_tpu.nn.interaction import CIN
    from xdeepfm_tpu.ops.cin import set_cin_backend

    x = jnp.asarray(rng.normal(size=(8, 6, 4)).astype(np.float32))
    cin = CIN(field_size=6, layer_size=(8, 6), split_half=True)
    params = cin.init(jax.random.PRNGKey(0), x)
    try:
        set_cin_backend("pallas")
        out_pl = cin.apply(params, x)
    finally:
        set_cin_backend("xla")
    out_xla = cin.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("impl", ["fused_t", "legacy"])
def test_backward_impls_match_xla(rng, impl):
    """Both backward implementations (transposed wide-lane kernel and the
    forward-reuse legacy path) match XLA autodiff."""
    B, H, M, D, O = 6, 13, 26, 10, 16
    h = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(O, H * M)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

    def loss_xla(h, x0, W, b):
        return jnp.sum(cin_layer_contract(h, x0, W, b, backend="xla") ** 2)

    def loss_pl(h, x0, W, b):
        return jnp.sum(cp.cin_pallas(h, x0, W, b) ** 2)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(h, x0, W, b)
    try:
        cp.set_backward_impl(impl)
        gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(h, x0, W, b)
    finally:
        cp.set_backward_impl("auto")
    for a, e, name in zip(gp, gx, ["dh", "dx0", "dW", "db"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-3, atol=1e-3, err_msg=name
        )
