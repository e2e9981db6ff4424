"""Loss functions. All pure ``(sr, hr) -> scalar`` on NHWC SAI mosaics.

Covers every loss family in the reference zoo:
- plain L1 (all benchmark models, e.g. DistgSSR.py get_loss),
- L1 + FFT-magnitude (MyEfficientLFNet.py:585-609),
- the V8 composite: Charbonnier + FFT + SSIM + Sobel gradient + angular
  parallax consistency (MyEfficientLFNetV8.py:870-951).

Losses always compute in float32 even when the model ran in bfloat16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lfsr_tpu.config import Config
from lfsr_tpu.ops.layout import sai_to_views


def _f32(x):
    return x.astype(jnp.float32)


def l1(sr, hr):
    return jnp.mean(jnp.abs(_f32(sr) - _f32(hr)))


def charbonnier(sr, hr, eps: float = 1e-9):
    d = _f32(sr) - _f32(hr)
    return jnp.mean(jnp.sqrt(d * d + eps * eps))


def fft_magnitude_l1(sr, hr):
    """L1 between rfft2 magnitudes over the spatial axes (V8:886-887)."""
    fs = jnp.abs(jnp.fft.rfft2(_f32(sr), axes=(1, 2)))
    fh = jnp.abs(jnp.fft.rfft2(_f32(hr), axes=(1, 2)))
    return jnp.mean(jnp.abs(fs - fh))


def _box_blur(a, window: int):
    """Uniform KxK mean filter, SAME zero padding (== the depthwise conv
    torch's avg_pool2d formulation uses), as two separable shift-add
    passes. The direct form is a 1-output-lane conv on [B, H, W, 1]
    mosaics — 1/128 MXU lane utilization in forward AND VJP (the r3
    train-step trace's loss-backward bucket); shifted adds are pure
    elementwise ops XLA fuses, and their VJP is shifted adds again."""
    p = window // 2

    def pass_along(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (p, p)
        xp = jnp.pad(x, pad)
        n = x.shape[axis]
        idx = [slice(None)] * x.ndim
        acc = None
        for k in range(window):
            idx[axis] = slice(k, k + n)
            t = xp[tuple(idx)]
            acc = t if acc is None else acc + t
        return acc

    return pass_along(pass_along(a, 1), 2) / (window * window)


def ssim_loss(sr, hr, window: int = 7):
    """1 - SSIM with a uniform window (avg-pool implementation mirroring
    V8:889-909, including the variance clamp)."""
    x, y = _f32(sr), _f32(hr)
    c1, c2 = 0.01**2, 0.03**2

    def blur(a):
        return _box_blur(a, window)

    mx, my = blur(x), blur(y)
    vx = jnp.clip(blur(x * x) - mx * mx, 0)
    vy = jnp.clip(blur(y * y) - my * my, 0)
    vxy = blur(x * y) - mx * my
    s = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )
    return 1.0 - jnp.mean(s)


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)


def _shift(x, axis, d):
    """x shifted by d along axis with zero fill (conv-with-zero-pad tap)."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(d, 0), max(-d, 0))
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(max(-d, 0), max(-d, 0) + n)
    return jnp.pad(x, pad)[tuple(idx)]


def _sobel_x(a):
    """Sobel-x = [1,2,1]^T (x) [-1,0,1], as separable shift-adds (the
    3x3 form is a 1-output-lane conv on the SAI mosaic — see _box_blur)."""
    a = _f32(a)
    s = _shift(a, 1, 1) + 2.0 * a + _shift(a, 1, -1)  # smooth along H
    return _shift(s, 2, -1) - _shift(s, 2, 1)          # diff along W


def _sobel_y(a):
    a = _f32(a)
    s = _shift(a, 2, 1) + 2.0 * a + _shift(a, 2, -1)
    return _shift(s, 1, -1) - _shift(s, 1, 1)


def gradient_l1(sr, hr):
    """L1 over Sobel-x and Sobel-y responses (V8:912-918)."""
    return jnp.mean(jnp.abs(_sobel_x(sr) - _sobel_x(hr))) + jnp.mean(
        jnp.abs(_sobel_y(sr) - _sobel_y(hr))
    )


def angular_consistency(sr, hr, ang: int):
    """L1 on adjacent-view parallax differences in both angular axes
    (V8:930-946)."""
    sv = sai_to_views(_f32(sr[..., 0]), ang)  # [B, U, V, h, w]
    hv = sai_to_views(_f32(hr[..., 0]), ang)
    lu = jnp.mean(jnp.abs(jnp.diff(sv, axis=1) - jnp.diff(hv, axis=1)))
    lv = jnp.mean(jnp.abs(jnp.diff(sv, axis=2) - jnp.diff(hv, axis=2)))
    return lu + lv


# ---------------------------------------------------------------------------
# Builders (registered per model)
# ---------------------------------------------------------------------------


def l1_builder(cfg: Config):
    return l1


def l1_fft_builder(cfg: Config):
    w = cfg.mk("fft_weight", 0.05)

    def loss(sr, hr):
        return l1(sr, hr) + w * fft_magnitude_l1(sr, hr)

    return loss


def composite_v8_builder(cfg: Config):
    """Charbonnier + 0.1 FFT + 0.02 SSIM + 0.04 gradient + 0.06 angular
    (V8.1 weights, MyEfficientLFNetV8.py:875-881)."""
    eps = cfg.mk("charbonnier_eps", 1e-9)
    wf = cfg.mk("fft_weight", 0.1)
    ws = cfg.mk("ssim_weight", 0.02)
    wg = cfg.mk("grad_weight", 0.04)
    wa = cfg.mk("angular_weight", 0.06)
    ang = cfg.angRes

    def loss(sr, hr):
        out = charbonnier(sr, hr, eps)
        out += wf * fft_magnitude_l1(sr, hr)
        out += ws * ssim_loss(sr, hr)
        out += wg * gradient_l1(sr, hr)
        if sr.shape[1] % ang == 0 and sr.shape[2] % ang == 0:
            out += wa * angular_consistency(sr, hr, ang)
        return out

    return loss


def sobel_magnitude_l1(sr, hr):
    """L1 between Sobel gradient magnitudes sqrt(gx^2+gy^2+1e-6)
    (the V6 loss's "gradient_variance_loss", V6.py:606-620 — despite its
    name it compares magnitudes, not variances)."""
    kx = _SOBEL_X.reshape(3, 3, 1, 1)
    ky = _SOBEL_X.T.reshape(3, 3, 1, 1)

    def edge(a, k):
        return jax.lax.conv_general_dilated(
            _f32(a), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    pm = jnp.sqrt(edge(sr, kx) ** 2 + edge(sr, ky) ** 2 + 1e-6)
    tm = jnp.sqrt(edge(hr, kx) ** 2 + edge(hr, ky) ** 2 + 1e-6)
    return jnp.mean(jnp.abs(pm - tm))


def gradient_variance(sr, hr):
    """|Var(sobel(sr)) - Var(sobel(hr))| (V6_4.py:681-697)."""
    kx = _SOBEL_X.reshape(3, 3, 1, 1)
    ky = _SOBEL_X.T.reshape(3, 3, 1, 1)

    def edge(a, k):
        return jax.lax.conv_general_dilated(
            _f32(a), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    pv = jnp.var(edge(sr, kx)) + jnp.var(edge(sr, ky))
    tv = jnp.var(edge(hr, kx)) + jnp.var(edge(hr, ky))
    return jnp.abs(pv - tv)


def angular_consistency_h(sr, hr, ang: int):
    """Horizontal-parallax-only variant (V6_4.py:699-713)."""
    sv = sai_to_views(_f32(sr[..., 0]), ang)
    hv = sai_to_views(_f32(hr[..., 0]), ang)
    return jnp.mean(jnp.abs(jnp.diff(sv, axis=2) - jnp.diff(hv, axis=2)))


def laplacian_l1(sr, hr):
    """L1 over Laplacian edge responses (MyEfficientLFNetV7.py:864-872)."""
    k = jnp.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32).reshape(3, 3, 1, 1)

    def edge(a):
        return jax.lax.conv_general_dilated(
            _f32(a), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return jnp.mean(jnp.abs(edge(sr) - edge(hr)))


def composite_v7_builder(cfg: Config):
    """Charbonnier(1e-6) + 0.1 FFT + 0.01 Sobel-gradient L1 + 0.005
    Laplacian edge + 0.01 dual-axis angular consistency
    (MyEfficientLFNetV7.py:828-905 weights)."""
    ang = cfg.angRes
    eps = cfg.mk("charbonnier_eps", 1e-6)
    wf = cfg.mk("fft_weight", 0.1)
    wg = cfg.mk("grad_weight", 0.01)
    we = cfg.mk("edge_weight", 0.005)
    wa = cfg.mk("angular_weight", 0.01)

    def loss(sr, hr):
        out = charbonnier(sr, hr, eps)
        out += wf * fft_magnitude_l1(sr, hr)
        out += wg * gradient_l1(sr, hr)
        out += we * laplacian_l1(sr, hr)
        if sr.shape[1] % ang == 0 and sr.shape[2] % ang == 0:
            out += wa * angular_consistency(sr, hr, ang)
        return out

    return loss


def composite_v64_builder(cfg: Config):
    """Charbonnier(1e-6) + 0.1 FFT + 0.005 gradient variance + 0.01
    horizontal angular consistency (V6_4.py:660-720)."""
    ang = cfg.angRes
    wf = cfg.mk("fft_weight", 0.1)
    wg = cfg.mk("grad_weight", 0.005)
    wa = cfg.mk("angular_weight", 0.01)

    def loss(sr, hr):
        out = charbonnier(sr, hr, cfg.mk("charbonnier_eps", 1e-6))
        out += wf * fft_magnitude_l1(sr, hr)
        out += wg * gradient_variance(sr, hr)
        if sr.shape[1] % ang == 0:
            out += wa * angular_consistency_h(sr, hr, ang)
        return out

    return loss
