"""Parity: the blocked Pallas recurrence (ops/gru_pallas.py, interpret mode)
vs the lax.scan path, through the real GRU / DynamicGRU modules.

Semantics under test mirror the reference's packed-sequence behavior
(``deepctr/layers/sequence.py:192-320``): hidden state freezes past each
row's length; GRU additionally zeroes padded outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xdeepfm_tpu.nn.sequence import GRU, DynamicGRU
from xdeepfm_tpu.ops import gru_pallas


@pytest.fixture(autouse=True)
def _interpret_off_after():
    yield
    gru_pallas.set_interpret(False)


def _data(B=8, T=7, I=6, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(0, T + 1, size=(B,)).astype(np.int32))
    att = jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32))
    return x, lengths, att


def test_gru_module_kernel_matches_scan():
    x, lengths, _ = _data()
    m = GRU(input_size=6, hidden_size=10)
    params = m.init(jax.random.PRNGKey(0), x, lengths)

    gru_pallas.set_interpret(False)
    outs_scan, hl_scan = m.apply(params, x, lengths)
    gru_pallas.set_interpret(True)
    outs_k, hl_k = m.apply(params, x, lengths)

    np.testing.assert_allclose(outs_k, outs_scan, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(hl_k, hl_scan, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gru_type", ["AGRU", "AUGRU"])
def test_dynamic_gru_kernel_matches_scan(gru_type):
    x, lengths, att = _data(seed=3)
    m = DynamicGRU(input_size=6, hidden_size=10, gru_type=gru_type)
    params = m.init(jax.random.PRNGKey(1), x, att, lengths)

    gru_pallas.set_interpret(False)
    outs_scan = m.apply(params, x, att, lengths)
    gru_pallas.set_interpret(True)
    outs_k = m.apply(params, x, att, lengths)

    np.testing.assert_allclose(outs_k, outs_scan, rtol=1e-5, atol=1e-5)


def test_dynamic_gru_kernel_grads_match_scan():
    x, lengths, att = _data(seed=5)
    m = DynamicGRU(input_size=6, hidden_size=10, gru_type="AUGRU")
    params = m.init(jax.random.PRNGKey(2), x, att, lengths)

    def loss(p, xx, aa):
        return jnp.sum(jnp.sin(m.apply(p, xx, aa, lengths)) * 1.3)

    gru_pallas.set_interpret(False)
    g_scan = jax.grad(loss, argnums=(0, 1, 2))(params, x, att)
    gru_pallas.set_interpret(True)
    g_k = jax.grad(loss, argnums=(0, 1, 2))(params, x, att)

    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_k)
    for a, b in zip(flat_k, flat_s):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_gru_module_kernel_grads_match_scan():
    x, lengths, _ = _data(seed=7)
    m = GRU(input_size=6, hidden_size=10)
    params = m.init(jax.random.PRNGKey(4), x, lengths)

    def loss(p, xx):
        outs, hl = m.apply(p, xx, lengths)
        return jnp.sum(jnp.cos(outs)) + jnp.sum(hl * 0.7)

    gru_pallas.set_interpret(False)
    g_scan = jax.grad(loss, argnums=(0, 1))(params, x)
    gru_pallas.set_interpret(True)
    g_k = jax.grad(loss, argnums=(0, 1))(params, x)

    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_k, _ = jax.tree_util.tree_flatten(g_k)
    for a, b in zip(flat_k, flat_s):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_pick_bt_lane_alignment():
    """The batch tile rides the LANE axis: it must be a multiple of 128 or
    the whole axis (Mosaic rule interpret mode cannot check) — odd batch
    sizes must fall back to a whole-axis block, never a sub-128 divisor."""
    from xdeepfm_tpu.ops.gru_pallas import _pick_bt

    for B in (8, 24, 192, 320, 500, 4096, 1000):
        bt = _pick_bt(B)
        assert bt % 128 == 0 or bt == B, (B, bt)
        assert B % bt == 0, (B, bt)
