"""LF-IINet — intra/inter-view feature interaction.

Re-design of the reference LF_IINet (LF_IINet.py:16-334): parallel
intra-view (per-view) and inter-view (all views stacked as channels)
feature extractors built from ResASPP (1/2/4-dilated) + residual blocks,
four interaction rounds (Intra_inter_FUM: per-view fusion with the shared
inter feature, a 1x1 conv over the full n*c channel stack, and an
inter-feature update) each followed by a Multi-view Context Block (3-D
convs over the view axis with 1/2/4 view-dilated ASPP), feature blending
with SE attention over the concatenated four rounds, per-view
pixel-shuffle reconstruction, bicubic residual.

The reference's per-view Python loop in the FUM (:155-162) becomes one
batched conv over [B*N, h, w, 2C].
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai
from lfsr_tpu.ops.resize import interpolate


def _conv3d(feats, kernel=(3, 3, 3), dilation=(1, 1, 1), use_bias=False, dtype=None):
    pad = [(d * (k - 1) // 2,) * 2 for k, d in zip(kernel, dilation)]
    return nn.Conv(
        feats, kernel_size=kernel, kernel_dilation=dilation, padding=pad,
        use_bias=use_bias, dtype=dtype,
    )


class _RB(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = lrelu(conv(self.feats, 3, padding=1, dtype=self.dtype)(x))
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        return x + y


class _ResASPP(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        outs = [
            lrelu(conv(self.feats, 3, padding=d, dilation=d, use_bias=False,
                       dtype=self.dtype)(x))
            for d in (1, 2, 4)
        ]
        y = conv(self.feats, 1, dtype=self.dtype)(jnp.concatenate(outs, -1))
        return x + y


class _FeaExtract(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # [B', h, w, cin]
        y = conv(self.feats, 1, use_bias=False, dtype=self.dtype)(x)
        y = _ResASPP(self.feats, self.dtype)(y)
        y = _RB(self.feats, self.dtype)(y)
        y = _ResASPP(self.feats, self.dtype)(y)
        y = _RB(self.feats, self.dtype)(y)
        return y


class _FUM(nn.Module):
    """Intra/inter feature updating module (LF_IINet.py:135-171)."""

    feats: int
    n_views: int
    last: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, intra, inter):
        # intra: [B, N, h, w, C]; inter: [B, h, w, C]
        b, n, h, w, c = intra.shape
        dt = self.dtype
        inter_b = jnp.broadcast_to(inter[:, None], (b, n, h, w, c))
        fused = jnp.concatenate([intra, inter_b], -1).reshape(b * n, h, w, 2 * c)
        fused = lrelu(conv(c, 1, dtype=dt)(fused))  # conv_fusing
        stacked = fused.reshape(b, n, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)
        shared = conv(n * c, 1, dtype=dt)(stacked)  # conv_sharing

        if not self.last:
            fc = conv(c, 1, dtype=dt)(stacked)
            out_inter = conv(c, 1, dtype=dt)(jnp.concatenate([fc, inter], -1))
        else:
            out_inter = inter
        out_intra = shared.reshape(b, h, w, n, c).transpose(0, 3, 1, 2, 4)
        return out_intra, out_inter


class _MCB(nn.Module):
    """Multi-view context block: 3-D convs over (view, h, w)
    (LF_IINet.py:173-191)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # [B, N, h, w, C]
        dt = self.dtype
        y = _conv3d(self.feats, dtype=dt)(x)
        z = nn.leaky_relu(y, negative_slope=0.02)
        outs = [
            lrelu(_conv3d(self.feats, dilation=(d, 1, 1), dtype=dt)(z))
            for d in (1, 2, 4)
        ]
        aspp = _conv3d(self.feats, use_bias=True, dtype=dt)(jnp.concatenate(outs, -1)) + z
        return _conv3d(self.feats, kernel=(1, 1, 1), dtype=dt)(aspp) + x


class _FBM(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # [B, N, h, w, C]
        b, n, h, w, c = x.shape
        y = x.reshape(b * n, h, w, c)
        for _ in range(4):
            y = _RB(c, self.dtype)(y)
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            se = nn.relu(conv(max(c // 16, 1), 1, dtype=self.dtype)(se))
            se = nn.sigmoid(conv(c, 1, dtype=self.dtype)(se))
            y = y * se
        return y.reshape(b, n, h, w, c)


@register_model("LF_IINet")
class LFIINet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 32)
        n = a * a

        v = sai_to_views(x[..., 0], a)  # [B, A, A, h, w]
        b, _, _, h, w = v.shape
        views = v.reshape(b, n, h, w)[..., None].astype(dt)  # [B,N,h,w,1]

        up = interpolate(v.reshape(b * n, 1, h, w), s, method="bicubic")
        up = views_to_sai(up.reshape(b, a, a, h * s, w * s))[..., None]

        intra = _FeaExtract(c, dt)(views.reshape(b * n, h, w, 1)).reshape(b, n, h, w, c)
        inter_in = views[..., 0].transpose(0, 2, 3, 1)  # [B, h, w, N]
        inter = _FeaExtract(c, dt)(inter_in)

        feats = []
        for i in range(4):
            intra, inter = _FUM(c, n, last=(i == 3), dtype=dt)(intra, inter)
            intra = _MCB(c, dt)(intra)
            feats.append(intra)

        cat = jnp.concatenate(feats, -1)  # [B, N, h, w, 4C]
        cat = _FBM(4 * c, dt)(cat)

        y = cat.reshape(b * n, h, w, 4 * c)
        y = conv(c * s * s, 1, use_bias=False, dtype=dt)(y)
        y = pixel_shuffle(y, s)
        y = conv(1, 1, use_bias=False, dtype=dt)(y)
        out = views_to_sai(y.reshape(b, a, a, h * s, w * s, 1)[..., 0], a)[..., None]
        return out.astype(jnp.float32) + up
