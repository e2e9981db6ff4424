"""PSNR/SSIM parity against a float64 scipy re-derivation of skimage's
structural_similarity(gaussian_weights=True) formula."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from lfsr_tpu.ops.metrics import psnr, ssim, lf_metrics

RNG = np.random.default_rng(4)


def _skimage_ssim_f64(x, y, data_range=1.0, sample_cov=True):
    """skimage.metrics.structural_similarity with gaussian_weights=True,
    sigma=1.5, truncate=3.5 — re-derived in float64 with scipy."""
    sigma, truncate = 1.5, 3.5
    r = int(truncate * sigma + 0.5)
    win = 2 * r + 1
    filt = lambda a: gaussian_filter(a, sigma=sigma, truncate=truncate)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    npix = win * win
    cov_norm = npix / (npix - 1) if sample_cov else 1.0
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def test_psnr_formula():
    x = RNG.random((32, 32))
    y = x + RNG.normal(0, 0.01, x.shape)
    expect = 10 * np.log10(1.0 / np.mean((x - y) ** 2))
    got = float(psnr(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_ssim_matches_skimage_formula():
    x = RNG.random((48, 48))
    y = np.clip(x + RNG.normal(0, 0.05, x.shape), 0, 1)
    expect = _skimage_ssim_f64(x, y)
    got = float(ssim(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_ssim_identical_is_one():
    x = RNG.random((32, 32)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-5


def test_lf_metrics_view_average():
    ang, h, w = 5, 24, 24
    label = RNG.random((ang * h, ang * w))
    out = np.clip(label + RNG.normal(0, 0.02, label.shape), 0, 1)
    p, s = lf_metrics(
        jnp.asarray(label, jnp.float32), jnp.asarray(out, jnp.float32), ang
    )
    # oracle: per-view loops in float64
    lv = label.reshape(ang, h, ang, w).transpose(0, 2, 1, 3)
    ov = out.reshape(ang, h, ang, w).transpose(0, 2, 1, 3)
    psnrs, ssims = [], []
    for u in range(ang):
        for v in range(ang):
            mse = np.mean((lv[u, v] - ov[u, v]) ** 2)
            psnrs.append(10 * np.log10(1.0 / mse))
            ssims.append(_skimage_ssim_f64(lv[u, v], ov[u, v]))
    np.testing.assert_allclose(float(p), np.mean(psnrs), rtol=1e-4)
    np.testing.assert_allclose(float(s), np.mean(ssims), atol=5e-5)


def test_lf_metrics_re_excludes_input_views():
    from lfsr_tpu.ops.metrics import lf_metrics_re

    ang_in, ang_out, h = 2, 5, 24  # step = 4: views (0,0),(0,4),(4,0),(4,4) are inputs
    rng2 = np.random.default_rng(12)
    label = rng2.random((ang_out * h, ang_out * h)).astype(np.float32)
    out = label.copy().reshape(ang_out, h, ang_out, h)
    # corrupt ONLY the input views; synthesized views stay perfect
    for u in (0, 4):
        for v in (0, 4):
            out[u, :, v, :] = rng2.random((h, h))
    out = out.reshape(ang_out * h, ang_out * h)
    p, s = lf_metrics_re(jnp.asarray(label), jnp.asarray(out), ang_in, ang_out)
    # perfect on every counted view -> inf-ish PSNR, SSIM == 1
    assert float(s) > 0.999
    assert float(p) > 80
