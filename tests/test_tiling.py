"""Tiling tests: parity with the reference's unfold-based LFdivide and the
center-crop LFintegrate, re-derived here with torch (CPU) as the oracle."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from lfsr_tpu.ops.tiling import lf_divide, lf_integrate, tile_counts

RNG = np.random.default_rng(3)
ANG = 5


def _ref_image_extend(im, bdr):
    """utils/utils.py:137-149 semantics via torch flips."""
    _, _, h, w = im.shape
    lr = torch.flip(im, dims=[-1])
    ud = torch.flip(im, dims=[-2])
    diag = torch.flip(im, dims=[-1, -2])
    up = torch.cat((diag, ud, diag), dim=-1)
    mid = torch.cat((lr, im, lr), dim=-1)
    ext = torch.cat((up, mid, up), dim=-2)
    return ext[:, :, h - bdr[0] : 2 * h + bdr[1], w - bdr[2] : 2 * w + bdr[3]]


def _ref_lf_divide(sai, ang, patch, stride):
    """utils/utils.py:152-166 semantics with einops-free torch code."""
    H, W = sai.shape
    h0, w0 = H // ang, W // ang
    views = (
        torch.from_numpy(sai)
        .reshape(ang, h0, ang, w0)
        .permute(0, 2, 1, 3)
        .reshape(ang * ang, 1, h0, w0)
    )
    bdr = (patch - stride) // 2
    n1 = (h0 + bdr * 2 - 1) // stride
    n2 = (w0 + bdr * 2 - 1) // stride
    padded = _ref_image_extend(views, [bdr, bdr + stride - 1, bdr, bdr + stride - 1])
    sub = F.unfold(padded, kernel_size=patch, stride=stride)
    # (a1 a2) (h w) (n1 n2) -> n1 n2 (a1 h) (a2 w)
    sub = sub.reshape(ang, ang, patch, patch, n1, n2)
    sub = sub.permute(4, 5, 0, 2, 1, 3).reshape(n1, n2, ang * patch, ang * patch)
    return sub.numpy()


def test_lf_divide_matches_reference():
    h0, w0, patch, stride = 37, 43, 32, 16
    sai = RNG.random((ANG * h0, ANG * w0)).astype(np.float32)
    ours = np.asarray(lf_divide(jnp.asarray(sai), ANG, patch, stride))
    theirs = _ref_lf_divide(sai, ANG, patch, stride)
    n1, n2 = tile_counts(h0, w0, patch, stride)
    assert ours.shape == (n1 * n2, ANG * patch, ANG * patch)
    np.testing.assert_array_equal(ours, theirs.reshape(ours.shape))


def test_divide_integrate_identity():
    # With exact center-crop stitching, integrate(divide(x)) recovers x.
    h0, w0, patch, stride = 40, 56, 32, 16
    sai = RNG.random((ANG * h0, ANG * w0)).astype(np.float32)
    patches = lf_divide(jnp.asarray(sai), ANG, patch, stride)
    views = np.asarray(lf_integrate(patches, ANG, patch, stride, h0, w0))
    expect = np.asarray(
        jnp.reshape(jnp.asarray(sai), (ANG, h0, ANG, w0)).transpose(0, 2, 1, 3)
    )
    np.testing.assert_array_equal(views, expect)


def test_integrate_scaled_geometry():
    # SR patches: patch/stride in HR pixels (train.py:317-319 usage).
    h0, w0, patch, stride, s = 33, 35, 32, 16, 4
    sai = RNG.random((ANG * h0, ANG * w0)).astype(np.float32)
    patches = lf_divide(jnp.asarray(sai), ANG, patch, stride)
    n = patches.shape[0]
    # fake SR: nearest upsample by s
    up = np.repeat(np.repeat(np.asarray(patches), s, axis=-2), s, axis=-1)
    # but SAI blocks must scale per-view: rebuild properly instead
    pv = np.asarray(patches).reshape(n, ANG, patch, ANG, patch)
    pv = np.repeat(np.repeat(pv, s, axis=2), s, axis=4)
    up = pv.reshape(n, ANG * patch * s, ANG * patch * s)
    out = np.asarray(
        lf_integrate(jnp.asarray(up), ANG, patch * s, stride * s, h0 * s, w0 * s)
    )
    assert out.shape == (ANG, ANG, h0 * s, w0 * s)
    base = np.asarray(
        jnp.reshape(jnp.asarray(sai), (ANG, h0, ANG, w0)).transpose(0, 2, 1, 3)
    )
    expect = np.repeat(np.repeat(base, s, axis=-2), s, axis=-1)
    np.testing.assert_array_equal(out, expect)


# ---------------------------------------------------------------------------
# EPSW Gaussian-blended integration (MyEfficientLFNetV4_3.py:148-216)
# ---------------------------------------------------------------------------

from lfsr_tpu.ops.tiling import lf_integrate_gaussian


def _oracle_gaussian(patches, ang, patch, stride, h, w, sigma):
    """Brute-force V4_3-math accumulation over lf_divide's extended grid."""
    n1, n2 = tile_counts(h, w, patch, stride)
    w1d = np.exp(
        -((np.arange(patch) - patch / 2.0) ** 2) / (2.0 * sigma**2)
    )
    mask = w1d[:, None] * w1d[None, :]
    pv = patches.reshape(n1, n2, ang, patch, ang, patch).transpose(
        0, 1, 2, 4, 3, 5
    )
    s = stride
    ext = np.zeros((ang, ang, (n1 - 1) * s + patch, (n2 - 1) * s + patch))
    wsum = np.zeros(ext.shape[2:])
    for i in range(n1):
        for j in range(n2):
            ext[:, :, i * s : i * s + patch, j * s : j * s + patch] += (
                pv[i, j] * mask
            )
            wsum[i * s : i * s + patch, j * s : j * s + patch] += mask
    out = ext / wsum
    bdr = (patch - stride) // 2
    return out[..., bdr : bdr + h, bdr : bdr + w]


def test_integrate_gaussian_matches_oracle():
    h0, w0, patch, stride = 40, 56, 32, 16
    sigma = patch / 6.0
    n1, n2 = tile_counts(h0, w0, patch, stride)
    pats = RNG.random((n1 * n2, ANG * patch, ANG * patch)).astype(np.float32)
    ours = np.asarray(
        lf_integrate_gaussian(
            jnp.asarray(pats), ANG, patch, stride, h0, w0, sigma=sigma
        )
    )
    ref = _oracle_gaussian(
        pats.astype(np.float64), ANG, patch, stride, h0, w0, sigma
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_integrate_gaussian_non_divisible_patch():
    # patch not a multiple of stride exercises the padded-slice branch
    # (patch=40/stride=16 keeps the reference grid formula's coverage
    # invariant 2*bdr >= stride-1, unlike e.g. 24/16)
    h0, w0, patch, stride = 37, 43, 40, 16
    sigma = patch / 6.0
    n1, n2 = tile_counts(h0, w0, patch, stride)
    pats = RNG.random((n1 * n2, ANG * patch, ANG * patch)).astype(np.float32)
    ours = np.asarray(
        lf_integrate_gaussian(
            jnp.asarray(pats), ANG, patch, stride, h0, w0, sigma=sigma
        )
    )
    ref = _oracle_gaussian(
        pats.astype(np.float64), ANG, patch, stride, h0, w0, sigma
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_divide_integrate_gaussian_identity():
    # Contributions to any pixel are identical (they all come from the same
    # extended image), so the normalised blend is the identity too.
    h0, w0, patch, stride = 40, 56, 32, 16
    sai = RNG.random((ANG * h0, ANG * w0)).astype(np.float32)
    patches = lf_divide(jnp.asarray(sai), ANG, patch, stride)
    views = np.asarray(
        lf_integrate_gaussian(
            patches, ANG, patch, stride, h0, w0, sigma=patch / 6.0
        )
    )
    expect = np.asarray(
        jnp.reshape(jnp.asarray(sai), (ANG, h0, ANG, w0)).transpose(0, 2, 1, 3)
    )
    np.testing.assert_allclose(views, expect, rtol=1e-5, atol=1e-6)


def _identity_apply(params, x):
    return x


def test_sr_scene_epsw_wiring():
    # sr_scene(integrate='gaussian') with an identity model reproduces the
    # input views exactly — exercises the static-arg plumbing end to end.
    from lfsr_tpu.train.evaluate import sr_scene

    h0 = w0 = 48
    sai = RNG.random((ANG * h0, ANG * w0)).astype(np.float32)
    out = np.asarray(
        sr_scene(
            _identity_apply, {}, jnp.asarray(sai),
            ang=ANG, scale=1, patch=32, stride=16, minibatch=4,
            h0=h0, w0=w0, integrate="gaussian", integrate_sigma=None,
        )
    )
    expect = np.asarray(
        jnp.reshape(jnp.asarray(sai), (ANG, h0, ANG, w0)).transpose(0, 2, 1, 3)
    )
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_integrate_gaussian_no_nan_in_ext_tail():
    """When patch is not a stride multiple the extended grid has rows
    past (n1-1)*stride+patch with zero weight sum; the 0/0 there must be
    neutralized (cropped anyway) so jax_debug_nans stays clean (ADVICE
    r3): the FULL pre-crop division is exercised via a grad, which sees
    NaNs anywhere in the graph."""
    patch, stride, h0, w0 = 12, 8, 28, 28
    n1, n2 = tile_counts(h0, w0, patch, stride)
    rng = np.random.default_rng(7)
    pats = rng.random((n1 * n2, ANG * patch, ANG * patch)).astype(np.float32)

    import jax

    def f(p):
        return jnp.sum(
            lf_integrate_gaussian(p, ANG, patch, stride, h0, w0, sigma=2.0)
        )

    g = jax.grad(f)(jnp.asarray(pats))
    assert bool(jnp.all(jnp.isfinite(g)))
