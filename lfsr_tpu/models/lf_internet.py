"""LF_InterNet — spatial-angular feature interaction in the MacPI domain.

Re-design of the reference LF_InterNet (LF_InterNet.py:15-141, BASELINE
config #2): parallel angular (AxA stride-A) and spatial (3x3 dilation-A)
feature extractors, 4 cascaded interaction blocks of 4 chained
Spa2Ang/Ang2Spa exchanges, a bottleneck fusing all block outputs, and a
pixel-shuffle reconstruction head applied after MacPI->SAI.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


def _spa_conv(feats, ang, dtype):
    return conv(feats, 3, dilation=ang, padding=ang, use_bias=False, dtype=dtype)


class _Ang2Spa(nn.Module):
    """1x1 expand + PixelShuffle(A): angular map -> MacPI-resolution map
    (LF_InterNet.py:49-52)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, xa):
        y = conv(self.ang * self.ang * self.feats, 1, use_bias=False, dtype=self.dtype)(xa)
        return pixel_shuffle(y, self.ang)


class _InterChain(nn.Module):
    """One Spa<->Ang exchange (make_chains, LF_InterNet.py:44-67)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, xa, xs):
        a, dt = self.ang, self.dtype
        s2a = nn.relu(conv(self.feats, a, stride=a, use_bias=False, dtype=dt)(xs))
        a2s = _Ang2Spa(self.feats, a, dt)(xa)
        ya = jnp.concatenate([xa, s2a], axis=-1)
        ys = jnp.concatenate([xs, a2s], axis=-1)
        out_a = nn.relu(conv(self.feats, 1, use_bias=False, dtype=dt)(ya)) + xa
        out_s = nn.relu(_spa_conv(self.feats, a, dt)(ys)) + xs
        return out_a, out_s


@register_model("LF_InterNet")
class LFInterNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)
        n_groups = self.cfg.mk("n_groups", 4)
        n_blocks = self.cfg.mk("n_blocks", 4)

        m = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1).astype(dt)
        xa = conv(feats, a, stride=a, use_bias=False, dtype=dt)(m)
        xs = _spa_conv(feats, a, dt)(m)

        outs_a, outs_s = [], []
        ba, bs = xa, xs
        for _ in range(n_groups):
            for _ in range(n_blocks):
                ba, bs = _InterChain(feats, a, dt)(ba, bs)
            outs_a.append(ba)
            outs_s.append(bs)

        # Bottleneck (LF_InterNet.py:107-124)
        ya = nn.relu(conv(feats, 1, use_bias=False, dtype=dt)(jnp.concatenate(outs_a, -1)))
        ys = jnp.concatenate([jnp.concatenate(outs_s, -1), _Ang2Spa(feats, a, dt)(ya)], -1)
        fused = nn.relu(_spa_conv(feats, a, dt)(ys)) + xs

        # Reconstruction (LF_InterNet.py:127-141): conv -> MacPI->SAI -> shuffle
        y = conv(feats * s * s, 3, dilation=a, padding=a, use_bias=False, dtype=dt)(fused)
        y = macpi_to_sai(y.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        y = pixel_shuffle(y, s)
        y = conv(1, 1, use_bias=False, dtype=dt)(y)
        return y.astype(jnp.float32)
