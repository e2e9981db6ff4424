"""PSNR and SSIM matching skimage.metrics semantics, jit-compiled.

The reference evaluates per-view Y-channel PSNR (data_range=1.0) and SSIM
(gaussian_weights=True, i.e. 11x11 Gaussian window, sigma=1.5,
use_sample_covariance=True) averaged over the U x V views
(utils/utils.py:91-134; protocol stated in README.md:128-129). skimage
crops the SSIM map by (win-1)//2 on each side before averaging, so a VALID
separable convolution reproduces it exactly — boundary handling never
enters the cropped region.

The reference computes these on the CPU per training step (train.py:273,
the secondary hot loop); here ``lf_metrics`` is a single jit that vmaps
over all 25 views on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.ops.layout import sai_to_views

_SIGMA = 1.5
_TRUNCATE = 3.5  # scipy.ndimage.gaussian_filter default
_RADIUS = int(_TRUNCATE * _SIGMA + 0.5)  # 5 -> 11-tap window
_WIN = 2 * _RADIUS + 1


@functools.lru_cache(maxsize=1)
def _gauss_kernel() -> np.ndarray:
    x = np.arange(-_RADIUS, _RADIUS + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / _SIGMA) ** 2)
    return k / k.sum()


def _filter_valid(x: jnp.ndarray) -> jnp.ndarray:
    """Separable VALID Gaussian filter over the trailing two axes."""
    k = jnp.asarray(_gauss_kernel(), dtype=x.dtype)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xr = x.reshape(-1, 1, h, w)
    kh = k.reshape(1, 1, _WIN, 1)
    kw = k.reshape(1, 1, 1, _WIN)
    dn = ("NCHW", "OIHW", "NCHW")
    hi = jax.lax.Precision.HIGHEST  # keep f32 on the TPU (bf16 default skews SSIM)
    y = jax.lax.conv_general_dilated(
        xr, kh, (1, 1), "VALID", dimension_numbers=dn, precision=hi
    )
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=dn, precision=hi
    )
    return y.reshape(*lead, h - _WIN + 1, w - _WIN + 1)


def psnr(ref: jnp.ndarray, test: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the trailing two axes."""
    err = jnp.mean(
        (ref.astype(jnp.float32) - test.astype(jnp.float32)) ** 2, axis=(-2, -1)
    )
    return 10.0 * jnp.log10(data_range**2 / err)


def ssim(
    ref: jnp.ndarray,
    test: jnp.ndarray,
    data_range: float = 1.0,
    use_sample_covariance: bool = True,
) -> jnp.ndarray:
    """Structural similarity with skimage's gaussian_weights=True settings."""
    x = ref.astype(jnp.float32)
    y = test.astype(jnp.float32)
    np_taps = _WIN * _WIN
    cov_norm = np_taps / (np_taps - 1.0) if use_sample_covariance else 1.0

    ux = _filter_valid(x)
    uy = _filter_valid(y)
    uxx = _filter_valid(x * x)
    uyy = _filter_valid(y * y)
    uxy = _filter_valid(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(-2, -1))


@functools.partial(jax.jit, static_argnames=("ang",))
def lf_metrics(label_sai: jnp.ndarray, out_sai: jnp.ndarray, ang: int):
    """Per-view PSNR/SSIM averaged over views (utils/utils.py:91-134).

    Accepts SAI mosaics with arbitrary leading dims; returns scalar means
    across views and leading dims.
    """
    lv = sai_to_views(label_sai, ang)  # [..., U, V, h, w]
    ov = sai_to_views(out_sai, ang)
    p = psnr(lv, ov)
    s = ssim(lv, ov)
    return jnp.mean(p), jnp.mean(s)


@functools.partial(jax.jit, static_argnames=("ang_in", "ang_out"))
def lf_metrics_re(
    label_sai: jnp.ndarray, out_sai: jnp.ndarray, ang_in: int, ang_out: int
):
    """Angular-SR (task='RE') metric protocol (utils/utils.py:110-131):
    SSIM uses use_sample_covariance=False, and the metric average excludes
    the input views — every ((ang_out-1)//(ang_in-1))-th grid position.
    """
    lv = sai_to_views(label_sai, ang_out)
    ov = sai_to_views(out_sai, ang_out)
    p = psnr(lv, ov)
    s = ssim(lv, ov, use_sample_covariance=False)

    step = (ang_out - 1) // (ang_in - 1)
    grid = np.ones((ang_out, ang_out), np.float32)
    grid[::step, ::step] = 0.0  # zero out the input views
    mask = jnp.asarray(grid)
    # broadcast mask over leading dims; average over synthesized views only
    denom = jnp.sum(mask)
    lead = p.shape[:-2]
    m = jnp.broadcast_to(mask, (*lead, ang_out, ang_out))
    p_mean = jnp.sum(p * m) / (denom * max(1, int(np.prod(lead or (1,)))))
    s_mean = jnp.sum(s * m) / (denom * max(1, int(np.prod(lead or (1,)))))
    return p_mean, s_mean
