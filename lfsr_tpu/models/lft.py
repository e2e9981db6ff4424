"""LFT — Light Field Transformer: alternating angular and spatial MHSA.

Re-design of the reference LFT (LFT.py:19-260): per-view conv stem, then
4 alternating blocks of
- AngTrans: attention over the A^2 = 25 angular tokens (dim = channels),
  batched over every spatial position (LFT.py:206-246);
- SpaTrans: attention over the h*w spatial tokens (dim = 2*channels,
  embedded from unfolded 3x3 neighborhoods) with a 5x5 local-window
  additive mask (LFT.py:133-203);
with sinusoidal position encodings added to queries/keys only (values
stay raw — torch-MHA calling convention with value=token). The reference
injects PE and h/w via module-attribute side channels (LFT.py:75-88);
here they are ordinary function arguments.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu02, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.local_attention import local_window_mha
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai
from lfsr_tpu.ops.resize import interpolate


@functools.lru_cache(maxsize=16)
def _sincos_1d(length: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """Reference PositionEncoding for one axis (LFT.py:101-130): columns
    0::2 become sin, 1::2 become cos, concatenated halves."""
    grid = np.arange(dim, dtype=np.float64)
    grid = temperature ** (2 * (grid // 2) / dim)
    pos = np.arange(length, dtype=np.float64)[:, None] / grid[None, :]
    return np.concatenate([np.sin(pos[:, 0::2]), np.cos(pos[:, 1::2])], axis=1).astype(
        np.float32
    )  # [length, dim]


def spa_position(h: int, w: int, dim: int) -> np.ndarray:
    ph = _sincos_1d(h, dim)[:, None, :]
    pw = _sincos_1d(w, dim)[None, :, :]
    return ((ph + pw) / 2.0).astype(np.float32)  # [h, w, dim]


def ang_position(n: int, dim: int) -> np.ndarray:
    return _sincos_1d(n, dim)  # [n, dim]


class _MHA(nn.Module):
    """Torch-MHA-parity attention: q,k from the normed (PE-added) tokens,
    v from the raw tokens; all projections bias-free.

    ``local=(h, w, k_r, k_c)`` routes the attention through the banded
    local-window form (ops/local_attention.py) — numerically equivalent
    to the dense path under ``_band_mask(h, w, k_r, k_c)`` but without
    the [B, heads, L, L] score tensor (the r5 zoo MFU fix for SpaTrans:
    1024x1024 scores for a 25-neighbor band)."""

    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tok, pe, mask=None, local=None):
        dt = self.dim
        tn = nn.LayerNorm(dtype=self.dtype)(tok + pe)
        q = nn.Dense(dt, use_bias=False, dtype=self.dtype)(tn)
        k = nn.Dense(dt, use_bias=False, dtype=self.dtype)(tn)
        v = nn.Dense(dt, use_bias=False, dtype=self.dtype)(tok)
        b, L, _ = q.shape
        hd = dt // self.heads
        if local is not None:
            lh, lw, k_r, k_c = local
            o = local_window_mha(
                q, k, v, heads=self.heads, h=lh, w=lw, k_r=k_r, k_c=k_c
            ).astype(tok.dtype)
        else:
            split = lambda a: a.reshape(b, L, self.heads, hd)
            bias = None if mask is None else mask[None, None, :, :]
            o = nn.dot_product_attention(
                split(q), split(k), split(v), bias=bias
            ).reshape(b, L, dt)
        o = nn.Dense(dt, use_bias=False, dtype=self.dtype)(o)
        tok = tok + o
        f = nn.LayerNorm(dtype=self.dtype)(tok)
        f = nn.Dense(2 * dt, use_bias=False, dtype=self.dtype)(f)
        f = nn.relu(f)
        f = nn.Dense(dt, use_bias=False, dtype=self.dtype)(f)
        return tok + f


def _unfold3(x):
    """NHWC 3x3 neighborhood stack: [B,h,w,C] -> [B,h,w,9C] (zero pad)."""
    shifts = []
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    for di in range(3):
        for dj in range(3):
            shifts.append(xp[:, di : di + h, dj : dj + w, :])
    return jnp.concatenate(shifts, axis=-1)


class _AngTrans(nn.Module):
    channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C] (N = A^2 angular tokens)
        b, n, h, w, c = x.shape
        pe = jnp.asarray(ang_position(n, c))[None]  # [1, N, C]
        tok = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, n, c)
        tok = _MHA(c, 8, self.dtype)(tok, pe)
        return tok.reshape(b, h, w, n, c).transpose(0, 3, 1, 2, 4)


class _SpaTrans(nn.Module):
    channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C]; tokens over (h, w), embedded from 3x3 patches
        b, n, h, w, c = x.shape
        d = 2 * self.channels
        emb = nn.Dense(d, use_bias=False, dtype=self.dtype, name="embed")

        tok = emb(_unfold3(x.reshape(b * n, h, w, c)).reshape(b * n, h * w, 9 * c))
        pe2d = jnp.asarray(spa_position(h, w, c))  # [h, w, C]
        pe = emb(_unfold3(jnp.broadcast_to(pe2d[None], (1, h, w, c))).reshape(1, h * w, 9 * c))
        tok = _MHA(d, 8, self.dtype)(tok, pe, local=(h, w, 5, 5))
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(tok)
        return y.reshape(b, n, h, w, self.channels)


@register_model("LFT")
class LFT(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)

        # per-view bicubic residual (LFT.py interpolate, :263-273)
        v = sai_to_views(x[..., 0], a)
        b, u, vv, h, w = v.shape
        vu = interpolate(v.reshape(b * u * vv, 1, h, w), s, method="bicubic")
        up = views_to_sai(vu.reshape(b, u, vv, h * s, w * s))[..., None]

        views = v.reshape(b, u * vv, h, w, 1).astype(dt)
        y = conv(feats, 3, padding=1, use_bias=False, dtype=dt)(
            views.reshape(b * u * vv, h, w, 1)
        ).reshape(b, u * vv, h, w, feats)
        y = _ViewConv3Act(feats, dt)(y) + y

        skip = y
        for _ in range(self.cfg.mk("n_blocks", 4)):
            y = _AngTrans(feats, dt)(y)
            y = _SpaTrans(feats, dt)(y)
        y = y + skip

        sai = views_to_sai(
            y.reshape(b, u, vv, h, w, feats).transpose(0, 5, 1, 2, 3, 4)
        ).transpose(0, 2, 3, 1)
        out = conv(feats * s * s, 1, use_bias=False, dtype=dt)(sai)
        out = pixel_shuffle(out, s)
        out = lrelu02(out)
        out = conv(1, 3, padding=1, use_bias=False, dtype=dt)(out)
        return out.astype(jnp.float32) + up


class _ViewConv3Act(nn.Module):
    """Per-view conv stack with trailing activation (LFT.py:38-45 has
    LeakyReLU after the last conv, unlike EPIT's)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        y = x.reshape(b * n, h, w, c)
        for _ in range(3):
            y = lrelu02(conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(y))
        return y.reshape(b, n, h, w, c)
