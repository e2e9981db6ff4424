"""Selective scan: parallel and chunked forms vs the sequential oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from lfsr_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_chunked,
    selective_scan_sequential,
)

RNG = np.random.default_rng(5)


def _mk(B=2, L=64, D=8, N=4):
    u = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    delta = jnp.asarray(np.log1p(np.exp(RNG.normal(size=(B, L, D)))), jnp.float32)
    A = jnp.asarray(-np.exp(RNG.normal(size=(D, N))), jnp.float32)
    Bc = jnp.asarray(RNG.normal(size=(B, L, N)), jnp.float32)
    Cc = jnp.asarray(RNG.normal(size=(B, L, N)), jnp.float32)
    D_ = jnp.asarray(RNG.normal(size=(D,)), jnp.float32)
    return u, delta, A, Bc, Cc, D_


def test_parallel_matches_sequential():
    args = _mk()
    np.testing.assert_allclose(
        np.asarray(selective_scan(*args)),
        np.asarray(selective_scan_sequential(*args)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_chunked_matches_sequential():
    args = _mk(L=128)
    np.testing.assert_allclose(
        np.asarray(selective_scan_chunked(*args, chunk=32)),
        np.asarray(selective_scan_sequential(*args)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_grad_flows():
    u, delta, A, Bc, Cc, D_ = _mk(L=32)

    def f(u_):
        return jnp.sum(selective_scan(u_, delta, A, Bc, Cc, D_) ** 2)

    g = jax.grad(f)(u)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_jit_and_dtype():
    args = _mk()
    y = jax.jit(selective_scan)(*args)
    assert y.dtype == jnp.float32
    ybf = jax.jit(selective_scan)(args[0].astype(jnp.bfloat16), *args[1:])
    assert ybf.dtype == jnp.bfloat16
