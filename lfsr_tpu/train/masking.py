"""Masked angular pre-training, device-side and PRNG-keyed.

One implementation replacing the reference's duplicated external/internal
paths (utils/masked_pretraining.py:36-218 vs the model-internal SRACM in
MyEfficientLFNetV8.py:236-259 — SURVEY.md §2.4 notes train.py only ever
drives the external one).

Semantics preserved:
- view masking zeroes whole non-center views of the LR SAI mosaic; the HR
  target is never masked; each batch has a 50% chance of no masking at all
  (masked_pretraining.py:100-102);
- strategies: random / grid / corners / center (:141-171);
- the progressive curriculum interpolates the ratio start->end over
  ``warmup_epochs`` (:205-215);
- SRACM masks spatial positions consistently across all views
  (V8:236-247).

The number of masked views is static per epoch (host-computed), so jit
recompiles at most once per distinct count — everything else is traced.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


def progressive_ratio(epoch: int, start: float, end: float, warmup_epochs: int) -> float:
    t = min(1.0, epoch / max(1, warmup_epochs))
    return start + t * (end - start)


def num_masked_views(ang: int, ratio: float) -> int:
    return max(1, int(ang * ang * ratio))


def _strategy_order(key, ang: int, strategy: str) -> jnp.ndarray:
    """Priority order over the A*A views; the center view always last
    (never masked). Returns flat view indices [A*A]."""
    center = (ang // 2) * ang + (ang // 2)
    n = ang * ang
    iu, iv = np.divmod(np.arange(n), ang)
    if strategy == "grid":
        pri = jnp.asarray(((iu + iv) % 2 != 0).astype(np.float32) * 1e3)
    elif strategy == "corners":
        corner = ((iu % (ang - 1)) == 0) & ((iv % (ang - 1)) == 0)
        pri = jnp.asarray((~corner).astype(np.float32) * 1e3)
    elif strategy == "center":
        pri = jnp.asarray(
            (np.abs(iu - ang // 2) + np.abs(iv - ang // 2)).astype(np.float32)
        )
    else:  # random
        pri = jnp.zeros((n,), jnp.float32)
    pri = pri + jax.random.uniform(key, (n,))  # tie-break / randomize
    pri = pri.at[center].set(jnp.inf)
    return jnp.argsort(pri)


def mask_views(
    key: jax.Array,
    lr_sai: jnp.ndarray,  # [B, A*h, A*w] or [B, A*h, A*w, C]
    ang: int,
    k: int,
    strategy: str = "random",
    skip_prob: float = 0.5,
) -> jnp.ndarray:
    """Zero ``k`` whole views (same selection for the batch, like the
    reference's per-call choice)."""
    had_c = lr_sai.ndim == 4
    x = lr_sai if had_c else lr_sai[..., None]
    ksel, kskip = jax.random.split(key)
    order = _strategy_order(ksel, ang, strategy)
    masked_flags = jnp.zeros((ang * ang,), bool).at[order[:k]].set(True)
    keep = 1.0 - masked_flags.reshape(ang, ang).astype(x.dtype)

    v = sai_to_views(x.transpose(0, 3, 1, 2), ang)  # [B, C, U, V, h, w]
    v = v * keep[None, None, :, :, None, None]
    out = views_to_sai(v, ang).transpose(0, 2, 3, 1)

    apply = jax.random.bernoulli(kskip, 1.0 - skip_prob)
    out = jnp.where(apply, out, x)
    return out if had_c else out[..., 0]


def sracm(
    key: jax.Array,
    lr_sai: jnp.ndarray,  # [B, A*h, A*w, C]
    ang: int,
    ratio: float | jnp.ndarray,
) -> jnp.ndarray:
    """Spatially-Random Angularly-Consistent Masking (V8:236-247): one
    random spatial mask at per-view resolution, tiled across all views."""
    b = lr_sai.shape[0]
    h = lr_sai.shape[1] // ang
    w = lr_sai.shape[2] // ang
    m = jax.random.uniform(key, (1, h, w, 1)) >= ratio  # keep where True
    keep = jnp.tile(m, (1, ang, ang, 1)).astype(lr_sai.dtype)
    return lr_sai * keep
