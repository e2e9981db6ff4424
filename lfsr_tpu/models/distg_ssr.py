"""DistgSSR — disentangling spatial / angular / EPI convolutions.

TPU-native re-design of the reference DistgSSR (DistgSSR.py:14-131; the
efficiency-track conceptual baseline, BASELINE config #3). The model works
in the MacPI domain where plain 2-D convolutions express LF structure:

- spatial conv  = 3x3 with dilation A (touches same-view neighbors),
- angular conv  = AxA with stride A (one macro-pixel -> 1 px), expanded
  back with a 1x1 conv + PixelShuffle(A),
- EPI conv      = 1 x A^2 with stride (1, A), expanded back with a 1-D
  pixel shuffle along W; the vertical EPI branch shares weights with the
  horizontal one and runs on the transposed tensor.

Config: 64 channels, 4 groups x 4 blocks, bilinear global residual
(DistgSSR.py:17-36).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle, pixel_shuffle_1d
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.cnn_baselines import _nchw, _nhwc
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai
from lfsr_tpu.ops.resize import interpolate


def spatial_conv(feats: int, ang: int, dtype, name=None):
    """3x3 dilation-A conv on MacPI = per-view 3x3 spatial conv."""
    return conv(feats, 3, dilation=ang, padding=ang, use_bias=False, dtype=dtype, name=name)


class _EPIBranch(nn.Module):
    """1 x A^2 stride-(1,A) conv + expansion, shared between H and V passes
    (DistgSSR.py:90-96, 104-110)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        a = self.ang
        y = conv(
            self.feats,
            (1, a * a),
            stride=(1, a),
            padding=(0, a * (a - 1) // 2),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = lrelu(y)
        y = conv(a * self.feats, 1, use_bias=False, dtype=self.dtype)(y)
        y = lrelu(y)
        return pixel_shuffle_1d(y, a)


class _DisentgBlock(nn.Module):
    """Four-branch disentangling block (DistgSSR.py:73-111)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        a, dt = self.ang, self.dtype
        c_spa, c_ang, c_epi = self.feats, self.feats // 4, self.feats // 2

        spa = lrelu(spatial_conv(c_spa, a, dt)(x))
        spa = lrelu(spatial_conv(c_spa, a, dt)(spa))

        angf = lrelu(conv(c_ang, a, stride=a, use_bias=False, dtype=dt)(x))
        angf = lrelu(conv(a * a * c_ang, 1, use_bias=False, dtype=dt)(angf))
        angf = pixel_shuffle(angf, a)

        epi = _EPIBranch(c_epi, a, dt)
        epi_h = epi(x)
        epi_v = jnp.swapaxes(epi(jnp.swapaxes(x, 1, 2)), 1, 2)

        y = jnp.concatenate([spa, angf, epi_h, epi_v], axis=-1)
        y = lrelu(conv(self.feats, 1, use_bias=False, dtype=dt)(y))
        y = spatial_conv(self.feats, a, dt)(y)
        return x + y


class _Group(nn.Module):
    feats: int
    ang: int
    n_blocks: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.n_blocks):
            y = _DisentgBlock(self.feats, self.ang, self.dtype)(y)
        return x + spatial_conv(self.feats, self.ang, self.dtype)(y)


# whole_scene_ok stays False on MEASUREMENT: the quality gate passes
# (whole-scene+pad8 27.3998 vs tiled 27.4000 on a trained demo ckpt) but
# throughput REGRESSES — 2.18 whole vs 3.04 tiled scenes/s at the bench
# geometry: the batched mb=2 SAI-160 patches feed the MXU better than
# one huge-spatial conv dispatch despite 2.3x fewer FLOPs (PERF.md
# round-3 DistgSSR gate). Tiled stays the production default here.
@register_model("DistgSSR")
class DistgSSR(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)

        up = _nhwc(interpolate(_nchw(x), s, method="bilinear"))
        m = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        y = spatial_conv(feats, a, dt)(m.astype(dt))
        skip = y
        for _ in range(self.cfg.mk("n_groups", 4)):
            y = _Group(feats, a, self.cfg.mk("n_blocks", 4), dt)(y)
        y = spatial_conv(feats, a, dt)(y) + skip
        # back to SAI, then upsample (DistgSSR.py:24-27, 34-36)
        y = macpi_to_sai(y.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        y = conv(feats * s * s, 1, dtype=dt)(y)
        y = pixel_shuffle(y, s)
        y = conv(1, 1, use_bias=False, dtype=dt)(y)
        return y.astype(jnp.float32) + up
