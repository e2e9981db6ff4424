"""Batched overlap tiling for whole-scene evaluation.

The reference splits a scene into overlapping per-view patches with
``LFdivide`` (utils/utils.py:152-166: mirror-extend + F.unfold) and stitches
super-resolved patches back with a center crop in ``LFintegrate``
(utils/utils.py:169-178), then loops over patches one at a time on the GPU
(train.py:307-313). Here both transforms are pure static-shape gathers that
live inside jit, and the whole patch grid is processed as one batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


def tile_counts(h0: int, w0: int, patch: int, stride: int) -> tuple[int, int]:
    """Patch-grid shape for an h0 x w0 per-view image (utils.py:157-159)."""
    bdr = (patch - stride) // 2
    n1 = (h0 + bdr * 2 - 1) // stride
    n2 = (w0 + bdr * 2 - 1) // stride
    return n1, n2


def lf_divide(sai: jnp.ndarray, ang: int, patch: int, stride: int) -> jnp.ndarray:
    """Split an SAI mosaic ``[U*h0, V*w0]`` into overlapping SAI patches.

    Returns ``[n1*n2, ang*patch, ang*patch]``. Mirror extension uses
    whole-sample symmetric padding, identical to the reference's
    ImageExtend flip-and-concat construction (utils/utils.py:137-149).
    """
    views = sai_to_views(sai, ang)  # [U, V, h0, w0]
    h0, w0 = views.shape[-2], views.shape[-1]
    bdr = (patch - stride) // 2
    n1, n2 = tile_counts(h0, w0, patch, stride)
    pad = [(0, 0)] * (views.ndim - 2) + [
        (bdr, bdr + stride - 1),
        (bdr, bdr + stride - 1),
    ]
    padded = jnp.pad(views, pad, mode="symmetric")

    hidx = (np.arange(n1) * stride)[:, None] + np.arange(patch)[None, :]
    widx = (np.arange(n2) * stride)[:, None] + np.arange(patch)[None, :]
    x = jnp.take(padded, jnp.asarray(hidx.reshape(-1)), axis=-2)
    x = x.reshape(*views.shape[:-2], n1, patch, padded.shape[-1])
    x = jnp.take(x, jnp.asarray(widx.reshape(-1)), axis=-1)
    x = x.reshape(*views.shape[:-2], n1, patch, n2, patch)
    # [U, V, n1, p, n2, p] -> [n1, n2, U, V, p, p]
    x = jnp.moveaxis(jnp.moveaxis(x, -4, 0), -2, 1)
    sai_patches = views_to_sai(x, ang)  # [n1, n2, U*p, V*p]
    return sai_patches.reshape(n1 * n2, ang * patch, ang * patch)


def lf_integrate(
    patches: jnp.ndarray,
    ang: int,
    patch: int,
    stride: int,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Stitch SR patches ``[n1*n2, U*p, V*p]`` back into views ``[U,V,h,w]``.

    Center-crop stitching, no blending — semantics of utils/utils.py:169-178.
    ``patch``/``stride`` are in output (super-resolved) pixels.
    """
    n1, n2 = _grid_from_count(patches.shape[0], h, w, patch, stride)
    bdr = (patch - stride) // 2
    x = patches.reshape(n1, n2, ang, patch, ang, patch)
    x = jnp.moveaxis(x, -2, 3)  # [n1, n2, U, V, p, p]
    x = x[..., bdr : bdr + stride, bdr : bdr + stride]
    # [n1, n2, U, V, s, s] -> [U, V, n1, s, n2, s]
    x = jnp.transpose(x, (2, 3, 0, 4, 1, 5))
    x = x.reshape(ang, ang, n1 * stride, n2 * stride)
    return x[..., :h, :w]


def lf_integrate_gaussian(
    patches: jnp.ndarray,
    ang: int,
    patch: int,
    stride: int,
    h: int,
    w: int,
    *,
    sigma: float,
) -> jnp.ndarray:
    """EPSW-style Gaussian-blended stitching of SR patches.

    TPU-native descendant of the reference's Enhanced Position-Sensitive
    Windowing inference (MyEfficientLFNetV4_3.py:148-216): instead of
    :func:`lf_integrate`'s hard center crop, every patch contributes to
    the overlap region with a separable Gaussian weight centred on the
    patch, and the accumulated field is normalised by the weight sum.
    ``sigma`` is in output (SR) pixels; the reference convention is
    ``input_patch / 6`` in those units (V4_3.py:166).

    Unlike the reference — which tiles the raw image and special-cases the
    right/bottom edges (V4_3.py:195-216) — this operates on
    :func:`lf_divide`'s mirror-extended grid, so coverage is uniform and
    edge handling is implicit. The accumulation is expressed as
    ``ceil(p/s)^2`` static shifted grid-adds (no scatters), and the weight
    sum is a static separable numpy product, so the whole blend stays one
    fused XLA region under jit.
    """
    n1, n2 = _grid_from_count(patches.shape[0], h, w, patch, stride)
    bdr = (patch - stride) // 2
    x = patches.reshape(n1, n2, ang, patch, ang, patch)
    x = jnp.moveaxis(x, -2, 3)  # [n1, n2, U, V, p, p]
    coords = np.arange(patch, dtype=np.float64)
    w1d = np.exp(-((coords - patch / 2.0) ** 2) / (2.0 * float(sigma) ** 2))
    xw = x * jnp.asarray(w1d[:, None] * w1d[None, :], x.dtype)

    # Patch i occupies extended rows [i*s, i*s + p). Split each patch into
    # ceil(p/s) stride-sized slices: for a fixed slice k the n1 blocks are
    # disjoint and contiguous, so the add is one static reshape per (kh, kw).
    nk = -(-patch // stride)
    ext_h = (n1 - 1 + nk) * stride
    ext_w = (n2 - 1 + nk) * stride
    acc = jnp.zeros((ang, ang, ext_h, ext_w), x.dtype)
    for kh in range(nk):
        hs, he = kh * stride, min(patch, (kh + 1) * stride)
        for kw in range(nk):
            ws, we = kw * stride, min(patch, (kw + 1) * stride)
            blk = xw[:, :, :, :, hs:he, ws:we]
            if (he - hs, we - ws) != (stride, stride):
                blk = jnp.pad(
                    blk,
                    [(0, 0)] * 4
                    + [(0, stride - (he - hs)), (0, stride - (we - ws))],
                )
            blk = jnp.transpose(blk, (2, 3, 0, 4, 1, 5))
            blk = blk.reshape(ang, ang, n1 * stride, n2 * stride)
            acc = acc.at[
                :, :, hs : hs + n1 * stride, ws : ws + n2 * stride
            ].add(blk)

    # Static weight sum: sum of separable products over the grid is the
    # product of per-axis sums.
    ws_h = np.zeros(ext_h, np.float64)
    ws_w = np.zeros(ext_w, np.float64)
    for i in range(n1):
        ws_h[i * stride : i * stride + patch] += w1d
    for j in range(n2):
        ws_w[j * stride : j * stride + patch] += w1d
    # ext is rounded up to nk*stride, so when patch is not a stride
    # multiple the tail rows past (n1-1)*stride+patch have weight sum
    # exactly 0 — replace with 1 (the numerator there is 0 too and the
    # region is cropped below) so no 0/0 NaNs trip jax_debug_nans
    # (ADVICE r3). Exact elsewhere: Gaussian weights are strictly > 0.
    ws_h = np.where(ws_h == 0.0, 1.0, ws_h)
    ws_w = np.where(ws_w == 0.0, 1.0, ws_w)
    out = acc / jnp.asarray(ws_h[:, None] * ws_w[None, :], x.dtype)
    return out[..., bdr : bdr + h, bdr : bdr + w]


def _grid_from_count(n: int, h: int, w: int, patch: int, stride: int):
    """Recover (n1, n2) from the output extent (all args static under jit)."""
    bdr = (patch - stride) // 2
    n1 = (h + bdr * 2 - 1) // stride
    n2 = (w + bdr * 2 - 1) // stride
    assert n1 * n2 == n, f"patch count {n} != grid {n1}x{n2}"
    return n1, n2
