"""Layout round trips and equivalence with the reference's gather semantics."""

import numpy as np
import jax.numpy as jnp

from lfsr_tpu.ops.layout import (
    sai_to_macpi,
    macpi_to_sai,
    sai_to_views,
    views_to_sai,
    views_to_macpi,
    macpi_to_views,
    transpose_lf,
)

RNG = np.random.default_rng(1)
ANG = 5


def _ref_sai2macpi(x, ang):
    """Reference SAI2MacPI (DistgSSR.py:146-155), re-derived as numpy loops."""
    b, c, hu, wv = x.shape
    h, w = hu // ang, wv // ang
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            out[:, :, i * ang : (i + 1) * ang, j * ang : (j + 1) * ang] = x[
                :, :, i::h, j::w
            ]
    return out


def _ref_macpi2sai(x, ang):
    """Reference MacPI2SAI (DistgSSR.py:134-143), numpy loops."""
    b, c, H, W = x.shape
    h, w = H // ang, W // ang
    out = np.zeros_like(x)
    for i in range(ang):
        for j in range(ang):
            out[:, :, i * h : (i + 1) * h, j * w : (j + 1) * w] = x[
                :, :, i::ang, j::ang
            ]
    return out


def test_sai_macpi_matches_reference_gather():
    x = RNG.random((2, 3, ANG * 4, ANG * 6)).astype(np.float32)
    ours = np.asarray(sai_to_macpi(jnp.asarray(x), ANG))
    np.testing.assert_array_equal(ours, _ref_sai2macpi(x, ANG))


def test_macpi_sai_matches_reference_gather():
    x = RNG.random((2, 3, ANG * 4, ANG * 6)).astype(np.float32)
    ours = np.asarray(macpi_to_sai(jnp.asarray(x), ANG))
    np.testing.assert_array_equal(ours, _ref_macpi2sai(x, ANG))


def test_round_trips():
    x = jnp.asarray(RNG.random((1, 2, ANG * 7, ANG * 9)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(macpi_to_sai(sai_to_macpi(x, ANG), ANG)), np.asarray(x)
    )
    v = sai_to_views(x, ANG)
    assert v.shape == (1, 2, ANG, ANG, 7, 9)
    np.testing.assert_array_equal(np.asarray(views_to_sai(v)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(macpi_to_views(views_to_macpi(v), ANG)), np.asarray(v)
    )


def test_views_extraction_indexing():
    # view (u,v) of the SAI mosaic is the block [u*h:(u+1)*h, v*w:(v+1)*w]
    x = RNG.random((ANG * 3, ANG * 4)).astype(np.float32)
    v = np.asarray(sai_to_views(jnp.asarray(x), ANG))
    np.testing.assert_array_equal(v[2, 3], x[2 * 3 : 3 * 3, 3 * 4 : 4 * 4])


def test_transpose_lf_swaps_uv_and_hw():
    x = RNG.random((ANG * 3, ANG * 3)).astype(np.float32)
    t = np.asarray(transpose_lf(jnp.asarray(x)))
    v = np.asarray(sai_to_views(jnp.asarray(x), ANG))
    tv = np.asarray(sai_to_views(jnp.asarray(t), ANG))
    np.testing.assert_array_equal(tv, np.swapaxes(np.swapaxes(v, 0, 1), 2, 3))


def test_crossscan_relayout_equals_naive():
    """The wide-tensor directional relayout in CrossScanSSM must equal the
    naive per-group transpose/flip formulation exactly."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, h, w, c = 2, 6, 5, 8
    g = c // 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    # naive forward relayout
    gs = [x[..., :g], x[..., g:2*g], x[..., 2*g:3*g], x[..., 3*g:]]
    s0 = gs[0].reshape(b, h * w, g)
    s1 = gs[1].reshape(b, h * w, g)[:, ::-1]
    s2 = gs[2].transpose(0, 2, 1, 3).reshape(b, h * w, g)
    s3 = gs[3].transpose(0, 2, 1, 3).reshape(b, h * w, g)[:, ::-1]
    naive_seq = jnp.concatenate([s0, s1, s2, s3], -1)

    # wide-tensor forward relayout (lfmambax.CrossScanSSM)
    xr = x[:, ::-1, ::-1]
    xt = x.transpose(0, 2, 1, 3)
    xtr = xt[:, ::-1, ::-1]
    wide_seq = jnp.concatenate([
        x[..., :g].reshape(b, h * w, g),
        xr[..., g:2*g].reshape(b, h * w, g),
        xt[..., 2*g:3*g].reshape(b, h * w, g),
        xtr[..., 3*g:].reshape(b, h * w, g),
    ], -1)
    np.testing.assert_array_equal(np.asarray(naive_seq), np.asarray(wide_seq))

    # inverse relayout on an arbitrary "scan output"
    out = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)
    n0 = out[..., :g].reshape(b, h, w, g)
    n1 = out[..., g:2*g][:, ::-1].reshape(b, h, w, g)
    n2 = out[..., 2*g:3*g].reshape(b, w, h, g).transpose(0, 2, 1, 3)
    n3 = out[..., 3*g:][:, ::-1].reshape(b, w, h, g).transpose(0, 2, 1, 3)
    naive_y = jnp.concatenate([n0, n1, n2, n3], -1)

    out_img = out.reshape(b, h, w, c)
    out_rev = out_img[:, ::-1, ::-1]
    out_col = out.reshape(b, w, h, c).transpose(0, 2, 1, 3)
    out_col_rev = out_rev.reshape(b, w, h, c).transpose(0, 2, 1, 3)
    wide_y = jnp.concatenate([
        out_img[..., :g], out_rev[..., g:2*g],
        out_col[..., 2*g:3*g], out_col_rev[..., 3*g:],
    ], -1)
    np.testing.assert_array_equal(np.asarray(naive_y), np.asarray(wide_y))
