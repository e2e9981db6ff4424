"""hlfr_tail kernel math (interpret mode) + retired-status wiring.

The fused HLFR-tail Pallas kernel measured SLOWER than the XLA dot
chain on v5e (see ops/pallas_head.py _supported) and is retired from
the production path; these tests keep its math honest (so the negative
result stays reproducible) and pin that production routes through the
XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lfsr_tpu.ops.pallas_head as ph
from lfsr_tpu.models.lfmambax import _fold_out_conv


def _inputs(S=32, C=16, r=2, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((2, S, S, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, C * r * r)) * 0.1, jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, 1)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray([0.3], jnp.bfloat16)
    return y, w1, _fold_out_conv(k3, r), bias


def test_hlfr_tail_kernel_matches_reference_interpret():
    y, w1, kf, bias = _inputs()
    ph.FORCE_KERNEL_INTERPRET = True
    try:
        out = np.asarray(ph.hlfr_tail(y, w1, kf, bias), np.float32)
    finally:
        ph.FORCE_KERNEL_INTERPRET = False
    ref = np.asarray(ph.hlfr_tail_ref(y, w1, kf, bias), np.float32)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-3)


def test_hlfr_tail_production_routes_to_reference():
    y, w1, kf, bias = _inputs()
    assert not ph._supported(y)
    out = np.asarray(ph.hlfr_tail(y, w1, kf, bias), np.float32)
    ref = np.asarray(ph.hlfr_tail_ref(y, w1, kf, bias), np.float32)
    np.testing.assert_array_equal(out, ref)


def test_hlfr_tail_grad_matches_reference():
    y, w1, kf, bias = _inputs()
    yf = y.astype(jnp.float32)
    g = jax.grad(lambda v: jnp.sum(ph.hlfr_tail(v.astype(jnp.bfloat16), w1, kf, bias)))(yf)
    gr = jax.grad(lambda v: jnp.sum(ph.hlfr_tail_ref(v.astype(jnp.bfloat16), w1, kf, bias)))(yf)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=0, atol=1e-4)
