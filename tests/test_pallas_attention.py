"""Fused windowed-MHA kernel vs the pure-JAX oracle.

Runs in Pallas interpret mode on CPU; covers the multi-row-per-block
grid (rows_per_block=2) and the odd-row fallback (R=1), plus the
reference-math gradient path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfsr_tpu.ops.pallas_attention import (
    _win_mha_raw, window_mha_fused, window_mha_ref)

WS, HEADS, C = 8, 4, 64


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    T = WS * WS
    wqkv = jax.random.normal(ks[0], (C, 3 * C), jnp.float32) * 0.05
    wout = jax.random.normal(ks[1], (C, C), jnp.float32) * 0.05
    g = 1.0 + 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[3], (C,), jnp.float32)
    bias = jax.random.normal(ks[0], (T, HEADS * T), jnp.float32) * 0.02
    sc = jnp.asarray(0.7, jnp.float32)
    return wqkv, wout, g, b, bias, sc


@pytest.mark.parametrize("H,W,rpb", [(16, 24, 2), (24, 16, 2), (16, 16, 1)])
def test_kernel_matches_oracle(H, W, rpb):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, H, W, C), jnp.float32)
    wqkv, wout, g, b, bias, sc = _params(key)
    got = _win_mha_raw(x, wqkv, wout, g, b, bias, sc, ws=WS, heads=HEADS,
                       eps=1e-6, interpret=True, rows_per_block=rpb)
    want = window_mha_ref(x, wqkv, wout, g, b, bias, sc, ws=WS, heads=HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_odd_rows_fall_back_to_one_row_blocks():
    # H=24 -> 3 window rows; rows_per_block=2 does not divide -> R=1 path.
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 24, 16, C), jnp.float32)
    wqkv, wout, g, b, bias, sc = _params(key)
    got = _win_mha_raw(x, wqkv, wout, g, b, bias, sc, ws=WS, heads=HEADS,
                       eps=1e-6, interpret=True, rows_per_block=2)
    want = window_mha_ref(x, wqkv, wout, g, b, bias, sc, ws=WS, heads=HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_gradients_match_reference_math():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 16, 16, C), jnp.float32)
    wqkv, wout, g, b, bias, sc = _params(key)

    def loss_fused(x, wqkv):
        return jnp.sum(window_mha_fused(x, wqkv, wout, g, b, bias, sc) ** 2)

    def loss_ref(x, wqkv):
        return jnp.sum(window_mha_ref(x, wqkv, wout, g, b, bias, sc) ** 2)

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, wqkv)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, wqkv)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-4, rtol=1e-4)
