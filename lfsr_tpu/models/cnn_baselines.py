"""Single-image CNN baselines operating on the whole SAI mosaic.

Architecture parity with the reference zoo:
- VDSR: bicubic-upsample + 18 conv-relu layers + residual (VDSR.py:18-60).
- EDSR: 256ch, 32 residual blocks with 0.1 scaling, pixel-shuffle x2(x2)
  head (EDSR.py:17-70).
- RCAN: 10 residual groups x 20 RCAB channel-attention blocks, global
  skip, pixel-shuffle head (RCAN.py:14-110).

All are NHWC and treat the SAI mosaic as one image (no angular structure).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle, ChannelAttention
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.resize import interpolate


def _nchw(x):  # NHWC -> NCHW for the resize helper
    return x.transpose(0, 3, 1, 2)


def _nhwc(x):
    return x.transpose(0, 2, 3, 1)


def bicubic_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """torch-semantics bicubic upsample of an NHWC tensor.

    Stays on the dense-matmul interpolate: the phase-conv form
    (ops/resize.up_phase_conv, exact same linear map) measured SLOWER at
    the production geometries on v5e (6.4 vs 4.7 ms at [2,720,720,1],
    3.9 vs 2.1 at [8,160,160,1] — the 16-lane grouped conv + HR shuffle
    relayout cost more than the f32 matmuls they replace; PERF.md r4).
    Either way the residual is <1% of a whole-scene iteration."""
    return _nhwc(interpolate(_nchw(x), s, method="bicubic"))


@register_model("VDSR")
class VDSR(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        up = bicubic_up(x, s)
        y = up.astype(dt)
        feats = self.cfg.mk("channels", 64)
        y = nn.relu(conv(feats, 3, padding=1, use_bias=False, dtype=dt)(y))
        for _ in range(self.cfg.mk("n_layers", 18)):
            y = nn.relu(conv(feats, 3, padding=1, use_bias=False, dtype=dt)(y))
        y = conv(1, 3, padding=1, use_bias=False, dtype=dt)(y)
        return y.astype(jnp.float32) + up


class _EDSRBlock(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        return x + 0.1 * y


@register_model("EDSR")
class EDSR(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 256)
        y = conv(feats, 3, padding=1, dtype=dt)(x.astype(dt))
        skip = y
        for _ in range(self.cfg.mk("n_blocks", 32)):
            y = _EDSRBlock(feats, dt)(y)
        y = conv(feats, 3, padding=1, dtype=dt)(y) + skip
        for _ in range(s // 2):  # x2 per stage; s in {2, 4}
            y = conv(feats * 4, 1, dtype=dt)(y)
            y = pixel_shuffle(y, 2)
        y = conv(1, 3, padding=1, dtype=dt)(y)
        return y.astype(jnp.float32)


class _RCAB(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(x)
        y = lrelu(y)
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        y = ChannelAttention(hidden=4, dtype=self.dtype)(y)
        return x + y


class _RCANGroup(nn.Module):
    feats: int
    n_blocks: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.n_blocks):
            y = _RCAB(self.feats, self.dtype)(y)
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        return x + y


@register_model("RCAN")
class RCAN(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)
        y0 = conv(feats, 3, padding=1, dtype=dt)(x.astype(dt))
        y = y0
        for _ in range(self.cfg.mk("n_groups", 10)):
            y = _RCANGroup(feats, self.cfg.mk("n_blocks", 20), dt)(y)
        y = conv(feats, 3, padding=1, dtype=dt)(y) + y0
        y = conv(feats * s * s, 1, dtype=dt)(y)
        y = pixel_shuffle(y, s)
        y = conv(1, 3, padding=1, dtype=dt)(y)
        return y.astype(jnp.float32)
