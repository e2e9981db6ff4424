"""ITU-R BT.601 YCbCr <-> RGB on [0,1]-ranged arrays.

Matches the reference's utils/utils.py:181-204 (full 3x3 matrix with
offsets; the inverse is the analytic matrix inverse). Works on numpy and
jax arrays alike — the constant matrices are float64 numpy, so the numpy
path keeps double precision (as the data generators require) while the jax
path folds them to the array's dtype.
"""

from __future__ import annotations

import numpy as np

_FWD = np.array(
    [
        [65.481, 128.553, 24.966],
        [-37.797, -74.203, 112.0],
        [112.0, -93.786, -18.214],
    ],
    dtype=np.float64,
)
_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)

_INV = np.linalg.inv(_FWD) * 255.0
_INV_OFFSET = np.linalg.inv(_FWD) @ _OFFSET


def _apply_3x3(x, mat, offset, sign):
    """Elementwise 3x3 color transform. Deliberately NOT a matmul so the
    TPU evaluates it on the VPU in full float32 — MXU matmuls default to
    bf16 inputs, which costs ~3e-3 absolute error on [0,1] data."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    chans = [
        float(mat[i][0]) * r + float(mat[i][1]) * g + float(mat[i][2]) * b
        + sign * float(offset[i])
        for i in range(3)
    ]
    if isinstance(x, np.ndarray):
        return np.stack(chans, axis=-1)
    import jax.numpy as jnp

    return jnp.stack(chans, axis=-1)


def rgb2ycbcr(rgb):
    """[..., 3] RGB in [0,1] -> [..., 3] YCbCr in [0,1] (BT.601)."""
    return _apply_3x3(rgb, _FWD / 255.0, _OFFSET / 255.0, +1.0)


def ycbcr2rgb(ycbcr):
    """[..., 3] YCbCr in [0,1] -> [..., 3] RGB in [0,1] (BT.601 inverse)."""
    return _apply_3x3(ycbcr, _INV, _INV_OFFSET, -1.0)
