"""BT.601 color conversion parity with the reference formulas."""

import numpy as np

from lfsr_tpu.ops.color import rgb2ycbcr, ycbcr2rgb

RNG = np.random.default_rng(2)


def _ref_rgb2ycbcr(x):
    """utils/utils.py:181-188, re-derived."""
    y = np.zeros(x.shape, dtype="double")
    y[..., 0] = 65.481 * x[..., 0] + 128.553 * x[..., 1] + 24.966 * x[..., 2] + 16.0
    y[..., 1] = -37.797 * x[..., 0] - 74.203 * x[..., 1] + 112.0 * x[..., 2] + 128.0
    y[..., 2] = 112.0 * x[..., 0] - 93.786 * x[..., 1] - 18.214 * x[..., 2] + 128.0
    return y / 255.0


def test_rgb2ycbcr_matches_reference():
    x = RNG.random((16, 16, 3))
    np.testing.assert_allclose(rgb2ycbcr(x), _ref_rgb2ycbcr(x), atol=1e-14)


def test_roundtrip_identity():
    x = RNG.random((8, 8, 3))
    np.testing.assert_allclose(ycbcr2rgb(rgb2ycbcr(x)), x, atol=1e-12)


def test_jax_path():
    import jax.numpy as jnp

    x = RNG.random((8, 8, 3)).astype(np.float32)
    got = np.asarray(rgb2ycbcr(jnp.asarray(x)))
    np.testing.assert_allclose(got, _ref_rgb2ycbcr(x.astype(np.float64)), atol=1e-5)
