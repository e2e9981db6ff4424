"""Cross-scan gather/scatter Pallas kernels (interpret mode) vs the XLA
reference permutation path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lfsr_tpu.ops import pallas_layout as pll

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _force_interpret():
    pll.FORCE_KERNEL_INTERPRET = True
    yield
    pll.FORCE_KERNEL_INTERPRET = False


def _mk(B=2, S=16, C=8):
    x = jnp.asarray(RNG.normal(size=(B, S, S, C)), jnp.float32)
    gamma = jnp.asarray(RNG.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(RNG.normal(size=(C,)) * 0.1, jnp.float32)
    return x, gamma, beta


@pytest.mark.parametrize("S,C", [(16, 8), (24, 8), (32, 16)])
def test_gather_matches_reference(S, C):
    x, gamma, beta = _mk(S=S, C=C)
    got = np.asarray(pll.cross_scan_gather(x, gamma, beta))
    want = np.asarray(pll.cross_scan_gather_ref(x, gamma, beta))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S,C", [(16, 8), (24, 8)])
def test_scatter_matches_reference(S, C):
    B = 2
    x, _, _ = _mk(B=B, S=S, C=C)
    seq = jnp.asarray(RNG.normal(size=(B, S * S, C)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(C, C)) * 0.3, jnp.float32)
    scale = jnp.asarray([0.15], jnp.float32)
    got = np.asarray(pll.cross_scan_scatter(seq, x, w, scale))
    want = np.asarray(pll.cross_scan_scatter_ref(seq, x, w, scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gather_scatter_roundtrip_is_identity_permutation():
    # with identity LN (gamma=1, beta=0, pre-normalized rows), scatter of
    # gather's permutation with identity 1x1 and scale=1 must reproduce
    # the permutation algebra exactly: scatter(perm(x)) == x + perm^-1(perm(x))
    B, S, C = 1, 16, 8
    x = jnp.asarray(RNG.normal(size=(B, S, S, C)), jnp.float32)
    seq_ref_nold = _raw_perm(x)
    w = jnp.eye(C, dtype=jnp.float32)
    scale = jnp.asarray([1.0], jnp.float32)
    got = np.asarray(pll.cross_scan_scatter(jnp.asarray(seq_ref_nold), x, w, scale))
    np.testing.assert_allclose(got, 2.0 * np.asarray(x), rtol=1e-5, atol=1e-5)


def _raw_perm(x):
    b, h, w, c = x.shape
    g = c // 4
    x = np.asarray(x)
    s0 = x[..., :g].reshape(b, h * w, g)
    s1 = x[..., g : 2 * g].reshape(b, h * w, g)[:, ::-1]
    s2 = x[..., 2 * g : 3 * g].transpose(0, 2, 1, 3).reshape(b, h * w, g)
    s3 = x[..., 3 * g :].transpose(0, 2, 1, 3).reshape(b, h * w, g)[:, ::-1]
    return np.concatenate([s0, s1, s2, s3], axis=-1)


def test_gather_gradients_flow_through_reference():
    x, gamma, beta = _mk(S=16, C=8)

    def f(x_, g_, b_):
        return jnp.sum(pll.cross_scan_gather(x_, g_, b_) ** 2)

    def fr(x_, g_, b_):
        return jnp.sum(pll.cross_scan_gather_ref(x_, g_, b_) ** 2)

    got = jax.grad(f, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(fr, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_scatter_gradients_flow_through_reference():
    B, S, C = 1, 16, 8
    x, _, _ = _mk(B=B, S=S, C=C)
    seq = jnp.asarray(RNG.normal(size=(B, S * S, C)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(C, C)) * 0.3, jnp.float32)
    scale = jnp.asarray([0.15], jnp.float32)

    def f(s_, w_):
        return jnp.sum(pll.cross_scan_scatter(s_, x, w_, scale) ** 2)

    def fr(s_, w_):
        return jnp.sum(pll.cross_scan_scatter_ref(s_, x, w_, scale) ** 2)

    got = jax.grad(f, argnums=(0, 1))(seq, w)
    want = jax.grad(fr, argnums=(0, 1))(seq, w)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_bf16_dtype_preserved():
    x, gamma, beta = _mk(S=16, C=8)
    xb = x.astype(jnp.bfloat16)
    out = pll.cross_scan_gather(xb, gamma, beta)
    assert out.dtype == jnp.bfloat16


def test_gather_v2_matches_reference():
    """r5 XLA reformulation (double-flip + shared transpose) is exact."""
    key = jax.random.PRNGKey(5)
    for S, dt in ((16, jnp.float32), (24, jnp.bfloat16)):
        x = jax.random.normal(key, (2, S, S, 64), dt)
        gamma = 1.0 + 0.1 * jax.random.normal(key, (64,), jnp.float32)
        beta = 0.1 * jax.random.normal(key, (64,), jnp.float32)
        a = np.asarray(pll.cross_scan_gather_ref(x, gamma, beta), np.float32)
        b = np.asarray(pll.cross_scan_gather_v2(x, gamma, beta), np.float32)
        np.testing.assert_allclose(a, b, atol=0, rtol=0)


def test_scatter_v2_matches_reference():
    key = jax.random.PRNGKey(6)
    for S, dt in ((16, jnp.float32), (24, jnp.bfloat16)):
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (2, S, S, 64), dt)
        seq = jax.random.normal(ks[1], (2, S * S, 64), dt)
        w = 0.2 * jax.random.normal(ks[2], (64, 64), dt)
        scale = jnp.asarray([0.15], jnp.float32)
        a = np.asarray(pll.cross_scan_scatter_ref(seq, x, w, scale), np.float32)
        b = np.asarray(pll.cross_scan_scatter_v2(seq, x, w, scale), np.float32)
        # identical math; add order differs only in the final f32 sums
        tol = 2e-6 if dt == jnp.float32 else 2e-2
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)


@pytest.mark.parametrize("impl", ["xla", "xla_v2", "mixed", "kernel"])
def test_impl_switch_routes_and_matches_reference(impl):
    """set_cross_scan_impl must route the public entry points to the
    selected implementation and every impl must agree with the XLA
    reference forms (same tolerances as the direct tests)."""
    x, gamma, beta = _mk(S=16, C=8)
    seq = jnp.asarray(RNG.normal(size=(2, 16 * 16, 8)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(8, 8)) * 0.3, jnp.float32)
    scale = jnp.asarray([0.15], jnp.float32)
    try:
        pll.set_cross_scan_impl(impl)
        g = np.asarray(pll.cross_scan_gather(x, gamma, beta))
        s = np.asarray(pll.cross_scan_scatter(seq, x, w, scale))
    finally:
        pll.set_cross_scan_impl("kernel")
    np.testing.assert_allclose(
        g, np.asarray(pll.cross_scan_gather_ref(x, gamma, beta)),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        s, np.asarray(pll.cross_scan_scatter_ref(seq, x, w, scale)),
        rtol=2e-5, atol=2e-5,
    )
