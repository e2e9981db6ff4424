"""Pallas selective scan (interpret mode on CPU) vs the sequential oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lfsr_tpu.ops.pallas_scan import selective_scan_fused
from lfsr_tpu.ops.selective_scan import selective_scan, selective_scan_sequential

RNG = np.random.default_rng(6)


def _mk(B=2, L=256, D=8, N=4):
    u = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    delta = jnp.asarray(np.log1p(np.exp(RNG.normal(size=(B, L, D)))), jnp.float32)
    A = jnp.asarray(-np.exp(RNG.normal(size=(D, N))), jnp.float32)
    Bc = jnp.asarray(RNG.normal(size=(B, L, N)), jnp.float32)
    Cc = jnp.asarray(RNG.normal(size=(B, L, N)), jnp.float32)
    D_ = jnp.asarray(RNG.normal(size=(D,)), jnp.float32)
    return u, delta, A, Bc, Cc, D_


def test_fused_matches_oracle():
    args = _mk()
    got = np.asarray(selective_scan_fused(*args, 128))
    want = np.asarray(selective_scan_sequential(*args))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_fused_multi_chunk_carry():
    # carry propagation across 4 chunks of 64
    args = _mk(B=1, L=256)
    got = np.asarray(selective_scan_fused(*args, 64))
    want = np.asarray(selective_scan_sequential(*args))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_scan_proj_matches_composed_oracle():
    from lfsr_tpu.ops.pallas_scan import selective_scan_proj, scan_proj_ref

    u, _, A, _, _, D_ = _mk()
    B, L, D = u.shape
    N = A.shape[1]
    R = 3
    dbc = jnp.asarray(RNG.normal(size=(B, L, R + 2 * N)), jnp.float32)
    Wdt = jnp.asarray(RNG.normal(size=(R, D)) * 0.4, jnp.float32)
    bdt = jnp.asarray(RNG.normal(size=(D,)) * 0.2, jnp.float32)
    got = np.asarray(selective_scan_proj(u, dbc, Wdt, bdt, A, D_, 64))
    want = np.asarray(scan_proj_ref(u, dbc, Wdt, bdt, A, D_))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_scan_proj_gradients_match_reference():
    from lfsr_tpu.ops.pallas_scan import selective_scan_proj, scan_proj_ref

    u, _, A, _, _, D_ = _mk(B=1, L=128, D=4, N=2)
    B, L, D = u.shape
    N = A.shape[1]
    R = 2
    dbc = jnp.asarray(RNG.normal(size=(B, L, R + 2 * N)), jnp.float32)
    Wdt = jnp.asarray(RNG.normal(size=(R, D)) * 0.4, jnp.float32)
    bdt = jnp.asarray(RNG.normal(size=(D,)) * 0.2, jnp.float32)

    def f(u_, dbc_, W_):
        return jnp.sum(selective_scan_proj(u_, dbc_, W_, bdt, A, D_, 64) ** 2)

    def fr(u_, dbc_, W_):
        return jnp.sum(scan_proj_ref(u_, dbc_, W_, bdt, A, D_) ** 2)

    got = jax.grad(f, argnums=(0, 1, 2))(u, dbc, Wdt)
    want = jax.grad(fr, argnums=(0, 1, 2))(u, dbc, Wdt)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_scan_gated_matches_composed_oracle():
    from lfsr_tpu.ops.pallas_scan import scan_gated_fused

    u, delta, A, Bc, Cc, D_ = _mk()
    B, L, D = u.shape
    z = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    Wout = jnp.asarray(RNG.normal(size=(D, 6)) * 0.3, jnp.float32)
    got = np.asarray(scan_gated_fused(u, delta, A, Bc, Cc, z, D_, Wout, 64))
    y = np.asarray(selective_scan_sequential(u, delta, A, Bc, Cc, D_))
    zf = np.asarray(z)
    want = (y * (zf / (1 + np.exp(-zf)))) @ np.asarray(Wout)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_scan_gated_pre_softplus():
    from lfsr_tpu.ops.pallas_scan import scan_gated_fused

    u, _, A, Bc, Cc, D_ = _mk(B=1, L=128, D=8, N=4)
    B, L, D = u.shape
    dt_raw = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    z = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    Wout = jnp.asarray(RNG.normal(size=(D, D)) * 0.3, jnp.float32)
    got = np.asarray(
        scan_gated_fused(u, dt_raw, A, Bc, Cc, z, D_, Wout, 64, True)
    )
    delta = jax.nn.softplus(dt_raw)
    y = np.asarray(selective_scan_sequential(u, delta, A, Bc, Cc, D_))
    zf = np.asarray(z)
    want = (y * (zf / (1 + np.exp(-zf)))) @ np.asarray(Wout)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_scan_gated_gradients_match_reference():
    from lfsr_tpu.ops.pallas_scan import scan_gated_fused, scan_gated_ref

    u, delta, A, Bc, Cc, D_ = _mk(B=1, L=128, D=4, N=2)
    B, L, D = u.shape
    z = jnp.asarray(RNG.normal(size=(B, L, D)), jnp.float32)
    Wout = jnp.asarray(RNG.normal(size=(D, D)) * 0.3, jnp.float32)

    def f(impl):
        def g(u_, z_, W_):
            return jnp.sum(impl(u_, delta, A, Bc, Cc, z_, D_, W_, 64) ** 2)
        return g

    g1 = jax.grad(f(scan_gated_fused), argnums=(0, 1, 2))(u, z, Wout)
    g2 = jax.grad(f(lambda *a: scan_gated_ref(*a[:8])), argnums=(0, 1, 2))(
        u, z, Wout
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_fused_gradient_matches_reference_impl():
    u, delta, A, Bc, Cc, D_ = _mk(B=1, L=128, D=4, N=2)

    def f_fused(u_):
        return jnp.sum(selective_scan_fused(u_, delta, A, Bc, Cc, D_, 64) ** 2)

    def f_ref(u_):
        return jnp.sum(selective_scan(u_, delta, A, Bc, Cc, D_) ** 2)

    g1 = jax.grad(f_fused)(u)
    g2 = jax.grad(f_ref)(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_mamba_inner_fused_matches_ref():
    """Fused inner-pipeline kernel (scan_impl='fused') vs pure-JAX ref."""
    from lfsr_tpu.ops.pallas_scan import mamba_inner_fused, mamba_inner_ref

    rng = np.random.default_rng(0)
    B, L, Di, N, R, K = 2, 512, 80, 16, 5, 4
    f = jnp.float32
    args = (
        jnp.asarray(rng.standard_normal((B, L, Di)), f),
        jnp.asarray(rng.standard_normal((B, L, Di)), f),
        jnp.asarray(rng.standard_normal((K, Di)) * 0.2, f),
        jnp.asarray(rng.standard_normal((Di,)) * 0.1, f),
        jnp.asarray(rng.standard_normal((Di, R + 2 * N)) * 0.1, f),
        jnp.asarray(rng.standard_normal((R, Di)) * 0.2, f),
        jnp.asarray(rng.standard_normal((Di,)) * 0.1, f),
        -jnp.asarray(np.abs(rng.standard_normal((Di, N))) + 0.1, f),
        jnp.ones((Di,), f),
    )
    y_ref = jax.jit(mamba_inner_ref)(*args)
    y_fus = jax.jit(mamba_inner_fused)(*args)
    assert float(jnp.max(jnp.abs(y_ref - y_fus))) < 1e-5

    g_ref = jax.grad(lambda *a: jnp.sum(mamba_inner_ref(*a) ** 2), argnums=(0, 4))(*args)
    g_fus = jax.grad(lambda *a: jnp.sum(mamba_inner_fused(*a) ** 2), argnums=(0, 4))(*args)
    for gr, gf in zip(g_ref, g_fus):
        assert float(jnp.max(jnp.abs(gr - gf))) < 1e-4


@pytest.mark.slow
def test_pallas_flat_lane_path_matches_reference():
    # explicit opt-in variant (measured slower than the padded default)
    from lfsr_tpu.ops.pallas_scan import _scan_pallas_raw
    import jax

    u, delta, A, Bc, Cc, D_ = _mk(B=2, L=256, D=32, N=4)
    ref = selective_scan(u, delta, A, Bc, Cc, jnp.zeros_like(D_) * 0)
    ref = selective_scan(u, delta, A, Bc, Cc, None)
    got = _scan_pallas_raw(u, delta, A, Bc, Cc,
                           interpret=jax.default_backend() != "tpu", flat=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)





@pytest.mark.slow
def test_scan_proj_pallas_bwd_multiblock_all_grads():
    """Round-3 Pallas adjoint kernel vs the associative-scan reference
    VJP, at a geometry with multiple grid blocks (reversed block walk,
    cross-block mu carry, saved h_bounds) and gradients for ALL six
    primals."""
    from lfsr_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(7)
    B, L, D, N, R = 2, 4096, 16, 4, 3  # chunk 128 x inner 16 -> 2 blocks
    u = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    dbc = jnp.asarray(rng.standard_normal((B, L, R + 2 * N)) * 0.5, jnp.float32)
    Wdt = jnp.asarray(rng.standard_normal((R, D)) * 0.3, jnp.float32)
    bdt = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.3), jnp.float32)
    Dk = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    args = (u, dbc, Wdt, bdt, A, Dk)

    def loss(a):
        return jnp.sum(jnp.sin(ps.selective_scan_proj(*a, 128)))

    try:
        ps.set_scan_bwd_impl("ref")
        g_ref = jax.grad(loss)(args)
        ps.set_scan_bwd_impl("pallas")
        g_pl = jax.grad(loss)(args)
    finally:
        ps.set_scan_bwd_impl("pallas")
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


@pytest.mark.slow
def test_scan_proj_pallas_bwd_no_dskip():
    from lfsr_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(8)
    B, L, D, N, R = 1, 256, 8, 4, 2
    u = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    dbc = jnp.asarray(rng.standard_normal((B, L, R + 2 * N)) * 0.5, jnp.float32)
    Wdt = jnp.asarray(rng.standard_normal((R, D)) * 0.3, jnp.float32)
    bdt = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((D, N)) * 0.3), jnp.float32)

    def loss(u_, dbc_):
        y = ps.selective_scan_proj(u_, dbc_, Wdt, bdt, A, None, 64)
        return jnp.sum(y**2)

    def loss_ref(u_, dbc_):
        y = ps.scan_proj_ref(u_, dbc_, Wdt, bdt, A, None)
        return jnp.sum(y**2)

    got = jax.grad(loss, argnums=(0, 1))(u, dbc)
    want = jax.grad(loss_ref, argnums=(0, 1))(u, dbc)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_scan_combine_bf16_close_to_f32():
    """Opt-in bf16 combine (eval lever): same scan within bf16 tolerance,
    and the switch restores f32 exactly."""
    import numpy as np
    from lfsr_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(0)
    B, L, D, N, R = 2, 512, 16, 4, 2
    u = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    dbc = jnp.asarray(0.3 * rng.standard_normal((B, L, R + 2 * N)), jnp.float32)
    Wdt = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)
    bdt = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((D, N)), jnp.float32))
    Ds = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    y32 = np.asarray(ps.selective_scan_proj(u, dbc, Wdt, bdt, A, Ds, 128))
    try:
        ps.set_scan_combine_dtype(jnp.bfloat16)
        y16 = np.asarray(ps.selective_scan_proj(u, dbc, Wdt, bdt, A, Ds, 128))
    finally:
        ps.set_scan_combine_dtype(jnp.float32)
    yb = np.asarray(ps.selective_scan_proj(u, dbc, Wdt, bdt, A, Ds, 128))

    assert np.array_equal(y32, yb), "switch must restore f32 exactly"
    scale = np.abs(y32).max()
    rel = np.abs(y16 - y32).max() / scale
    assert rel < 0.03, rel  # bf16 mantissa-level agreement
