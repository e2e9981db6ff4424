"""Light-field layout transforms: SAI mosaic <-> MacPI <-> per-view 4D.

All transforms are pure reshape/transpose, so under jit they compile to
free layout changes (XLA folds them into the consuming op) — unlike the
reference's gather/concat loops (DistgSSR.py:134-155), which materialize
copies. Semantics match the view/permute formulation the reference uses in
its newest models (MyEfficientLFNetV8.py:222-234).

Conventions
-----------
- SAI mosaic: ``[..., U*h, V*w]`` — a U x V grid of h x w views.
- MacPI: ``[..., h*U, w*V]`` — each spatial site holds a U x V macro-pixel.
- Views: ``[..., U, V, h, w]`` — explicit 4D light field.

The leading dimensions are arbitrary (batch, channels).
"""

from __future__ import annotations

import jax.numpy as jnp


def sai_to_views(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """[..., U*h, V*w] -> [..., U, V, h, w]."""
    *lead, H, W = x.shape
    h, w = H // ang, W // ang
    x = x.reshape(*lead, ang, h, ang, w)
    return jnp.moveaxis(x, -3, -2)  # [..., U, V, h, w]


def views_to_sai(x: jnp.ndarray, ang: int | None = None) -> jnp.ndarray:
    """[..., U, V, h, w] -> [..., U*h, V*w]."""
    *lead, U, V, h, w = x.shape
    x = jnp.moveaxis(x, -2, -3)  # [..., U, h, V, w]
    return x.reshape(*lead, U * h, V * w)


def views_to_macpi(x: jnp.ndarray) -> jnp.ndarray:
    """[..., U, V, h, w] -> [..., h*U, w*V]."""
    *lead, U, V, h, w = x.shape
    x = x.transpose(*range(len(lead)), -2, -4, -1, -3)  # [..., h, U, w, V]
    return x.reshape(*lead, h * U, w * V)


def macpi_to_views(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """[..., h*U, w*V] -> [..., U, V, h, w]."""
    *lead, H, W = x.shape
    h, w = H // ang, W // ang
    x = x.reshape(*lead, h, ang, w, ang)
    return x.transpose(*range(len(lead)), -3, -1, -4, -2)


def sai_to_macpi(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """SAI mosaic -> macro-pixel image (MyEfficientLFNetV8.py:222-227)."""
    return views_to_macpi(sai_to_views(x, ang))


def macpi_to_sai(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """Macro-pixel image -> SAI mosaic (MyEfficientLFNetV8.py:229-234)."""
    return views_to_sai(macpi_to_views(x, ang))


def flip_lf_h(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """Flip an SAI mosaic along W; angular V axis flips with it.

    Matches the augmentation semantics of utils/utils_datasets.py:155-165:
    a plain ``data[:, ::-1]`` on the SAI mosaic flips both the spatial W and
    the angular V axes simultaneously — which is the physically correct LF
    flip (flip_SAI, utils_datasets.py:142-152).
    """
    del ang
    return x[..., :, ::-1]


def flip_lf_v(x: jnp.ndarray, ang: int) -> jnp.ndarray:
    """Flip an SAI mosaic along H (and angular U with it)."""
    del ang
    return x[..., ::-1, :]


def transpose_lf(x: jnp.ndarray) -> jnp.ndarray:
    """Swap U<->V and H<->W on an SAI mosaic (utils_datasets.py:162-164)."""
    return jnp.swapaxes(x, -1, -2)
