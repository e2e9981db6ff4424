"""LFSSR — spatial-angular separable convolutions, cascaded x2 stages.

Re-design of the reference LFSSR (LFSSR.py:19-232): per-view 3x3 spatial
conv alternating with a 3x3 conv over the AxA angular grid at every
spatial position (AltFilter, :195-215), 10 filters per stage; each x2
stage outputs a learned residual over a conv+PixelShuffle image-path
upsample (:92-101); x4 cascades two stages (:103-177).

TPU note: the angular conv is expressed by reshaping the batch to
[B*h*w, A, A, C] — a pure layout change XLA folds into the conv, versus
the reference's transpose+view round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


class _AltFilter(nn.Module):
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, A, A, h, w, C]
        b, a1, a2, h, w, c = x.shape
        y = nn.relu(
            conv(c, 3, padding=1, dtype=self.dtype)(x.reshape(b * a1 * a2, h, w, c))
        )
        y = y.reshape(b, a1, a2, h, w, c).transpose(0, 3, 4, 1, 2, 5)
        y = nn.relu(
            conv(c, 3, padding=1, dtype=self.dtype)(y.reshape(b * h * w, a1, a2, c))
        )
        return y.reshape(b, h, w, a1, a2, c).transpose(0, 3, 4, 1, 2, 5)


class _Stage2x(nn.Module):
    """One x2 stage: 10 alt filters -> feature upsample + residual conv,
    image path conv+shuffle (net2x core, LFSSR.py:92-101)."""

    ang: int
    n_filters: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, feat, img):
        # feat: [B, A, A, h, w, 64]; img: [B, A, A, h, w, 1]
        b, a1, a2, h, w, c = feat.shape
        y = feat
        for _ in range(self.n_filters):
            y = _AltFilter(self.ang, self.dtype)(y)
        flat = y.reshape(b * a1 * a2, h, w, c)
        fup = conv(c * 4, 3, padding=1, dtype=self.dtype)(flat)
        fup = nn.relu(pixel_shuffle(fup, 2))
        res = conv(1, 3, padding=1, dtype=self.dtype)(fup)
        iflat = img.reshape(b * a1 * a2, h, w, 1)
        iup = pixel_shuffle(conv(4, 3, padding=1, dtype=self.dtype)(iflat), 2)
        sr = (res + iup).reshape(b, a1, a2, 2 * h, 2 * w, 1)
        fup = fup.reshape(b, a1, a2, 2 * h, 2 * w, c)
        return fup, sr


@register_model("LFSSR")
class LFSSR(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)
        nf = self.cfg.mk("n_blocks", 10)

        v = sai_to_views(x[..., 0], a)[..., None].astype(dt)  # [B,A,A,h,w,1]
        b, a1, a2, h, w, _ = v.shape
        feat = nn.relu(
            conv(feats, 3, padding=1, dtype=dt)(v.reshape(b * a1 * a2, h, w, 1))
        ).reshape(b, a1, a2, h, w, feats)

        feat, sr = _Stage2x(a, nf, dt)(feat, v)
        if s == 4:
            feat, sr = _Stage2x(a, nf, dt)(feat, sr)

        out = views_to_sai(sr[..., 0], a)[..., None]
        return out.astype(jnp.float32)
