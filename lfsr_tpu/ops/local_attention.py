"""Banded (local-window) multi-head attention as shifted reductions.

TPU-native form of attention under a k_r x k_c band mask over an (h, w)
token grid (LFT.py:133-203 SpaTrans semantics, mask from
``models.epit._band_mask``): token (i, j) attends to (i+di, j+dj) for
di in [-(k_r//2), k_r - k_r//2), dj likewise. A dense implementation
materializes [B, heads, L, L] scores with L = h*w and throws away all
but k_r*k_c entries per row; here each of the k_r*k_c window offsets is
one padded shift + multiply + reduce over head_dim — O(L * k_r * k_c)
VPU work, no L x L tensor anywhere, numerically identical to dense
softmax with the -inf band mask (masked entries contribute exactly 0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["local_window_mha"]

_NEG = -1e30  # large-negative instead of -inf: keeps softmax NaN-free


@functools.lru_cache(maxsize=32)
def _valid_mask(h: int, w: int, k_r: int, k_c: int) -> np.ndarray:
    """[h, w, k_r*k_c] bool: window slot (di, dj) in bounds at (i, j)."""
    iy = np.arange(h)[:, None, None]
    ix = np.arange(w)[None, :, None]
    offs = np.asarray(
        [
            (di, dj)
            for di in range(-(k_r // 2), k_r - k_r // 2)
            for dj in range(-(k_c // 2), k_c - k_c // 2)
        ]
    )  # [K, 2]
    ny = iy + offs[None, None, :, 0]
    nx = ix + offs[None, None, :, 1]
    return (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)


def local_window_mha(q, k, v, *, heads: int, h: int, w: int,
                     k_r: int, k_c: int):
    """Banded MHA over an (h, w) token grid.

    q/k/v: [B, L, D] with L = h*w, channel-contiguous heads (torch-MHA
    layout). Returns [B, L, D] f32. Equivalent to
    ``dot_product_attention`` with the ``_band_mask(h, w, k_r, k_c)``
    additive bias, computed without the [B, heads, L, L] score tensor.
    """
    B, L, D = q.shape
    assert L == h * w, (L, h, w)
    hd = D // heads
    f32 = jnp.float32
    q4 = (q.astype(f32) * (1.0 / np.sqrt(hd))).reshape(B, h, w, heads, hd)
    k4 = k.astype(f32).reshape(B, h, w, heads, hd)
    v4 = v.astype(f32).reshape(B, h, w, heads, hd)

    ry, rx = k_r // 2, k_c // 2
    # pad enough for the asymmetric forward reach of even windows
    py, px = max(ry, k_r - ry - 1), max(rx, k_c - rx - 1)
    kp = jnp.pad(k4, ((0, 0), (py, py), (px, px), (0, 0), (0, 0)))
    vp = jnp.pad(v4, ((0, 0), (py, py), (px, px), (0, 0), (0, 0)))

    offs = [
        (di, dj)
        for di in range(-ry, k_r - ry)
        for dj in range(-rx, k_c - rx)
    ]
    scores = jnp.stack(
        [
            jnp.einsum(
                "bhwnc,bhwnc->bhwn",
                q4,
                kp[:, py + di : py + di + h, px + dj : px + dj + w],
            )
            for di, dj in offs
        ],
        axis=-1,
    )  # [B, h, w, heads, K]
    valid = jnp.asarray(_valid_mask(h, w, k_r, k_c))[None, :, :, None, :]
    scores = jnp.where(valid, scores, _NEG)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    wgt = e / jnp.sum(e, axis=-1, keepdims=True)  # [B, h, w, heads, K]

    out = jnp.zeros((B, h, w, heads, hd), f32)
    for idx, (di, dj) in enumerate(offs):
        out = out + (
            wgt[..., idx : idx + 1]
            * vp[:, py + di : py + di + h, px + dj : px + dj + w]
        )
    return out.reshape(B, L, D)
