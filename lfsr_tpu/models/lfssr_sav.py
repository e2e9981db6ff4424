"""LFSSR-SAV — spatial-angular separable vs. correlated convolutions.

Re-design of the reference LFSSR_SAV (LFSSR_SAV.py:21-420): cascaded x2
stages (10 parallel-residual blocks each at 4x, fn=45). Each SAV_parallel
block adds two paths over the 4-D LF feature [B, U, V, h, w, C]:
- SAS: per-view 3x3 spatial conv, then 3x3 conv over the UxV angular grid
  at every pixel (:243-285);
- SAC: 3x3 conv over the vertical EPI plane (U, h), then over the
  horizontal EPI plane (V, w) (:287-337);
summed with the input (parares mode, :390-419). Stage heads are bilinear-
initialized ConvTranspose x2 upsamplers with a learned residual over a
transposed-conv image path (:127-226).

Deliberately NOT replicated: the reference's get_loss indexes out['SR']
while forward returns a tensor (:641-645) — train-time crash; loss is
plain L1 here. The pure-Python convNd (:421-634) backs only the unused
feature_concat mode and has no equivalent here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai

lrelu2 = lambda x: nn.leaky_relu(x, negative_slope=0.2)


class _SAS(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, U, V, h, w, C]
        b, u, v, h, w, c = x.shape
        y = lrelu2(conv(self.feats, 3, padding=1, dtype=self.dtype, name="spa")(
            x.reshape(b * u * v, h, w, c)
        ))
        y = y.reshape(b, u, v, h, w, c).transpose(0, 3, 4, 1, 2, 5)
        y = lrelu2(conv(self.feats, 3, padding=1, dtype=self.dtype, name="ang")(
            y.reshape(b * h * w, u, v, c)
        ))
        return y.reshape(b, h, w, u, v, c).transpose(0, 3, 4, 1, 2, 5)


class _SAC(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, u, v, h, w, c = x.shape
        y = x.transpose(0, 2, 4, 1, 3, 5)  # [B, V, w, U, h, C]
        y = lrelu2(conv(self.feats, 3, padding=1, dtype=self.dtype, name="ver")(
            y.reshape(b * v * w, u, h, c)
        ))
        y = y.reshape(b, v, w, u, h, c).transpose(0, 3, 4, 1, 2, 5)  # [B,U,h,V,w,C]
        y = lrelu2(conv(self.feats, 3, padding=1, dtype=self.dtype, name="hor")(
            y.reshape(b * u * h, v, w, c)
        ))
        return y.reshape(b, u, h, v, w, c).transpose(0, 1, 3, 2, 4, 5)


class _SAVParallel(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        return _SAS(self.feats, self.dtype)(x) + _SAC(self.feats, self.dtype)(x) + x


def _up2(x, feats, dtype, name):
    """ConvTranspose2d(k=4, s=2, p=1) equivalent (flax pad = k-1-p = 2)."""
    return nn.ConvTranspose(
        feats, kernel_size=(4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
        transpose_kernel=True, use_bias=True, dtype=dtype, name=name,
    )(x)


class _Stage(nn.Module):
    """One x2 stage: SAV blocks on the 4-D features, transposed-conv
    feature upsample + conv residual, transposed-conv image path."""

    ang: int
    feats: int
    out_feats: int
    n_layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, feat_flat, img_flat, h, w, bn):
        # feat_flat: [B*N, h, w, C]; img_flat: [B*N, h, w, 1]
        a, dt = self.ang, self.dtype
        c = feat_flat.shape[-1]
        f4 = feat_flat.reshape(bn // (a * a), a, a, h, w, c)
        for _ in range(self.n_layers):
            f4 = _SAVParallel(self.feats, dt)(f4)
        flat = f4.reshape(bn, h, w, c)
        fup = lrelu2(_up2(flat, self.out_feats, dt, "fup"))
        res = conv(1, 3, padding=1, dtype=dt, name="res")(fup)
        iup = _up2(img_flat, 1, dt, "iup")
        return fup, res + iup


@register_model("LFSSR_SAV")
class LFSSRSAV(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        fn = self.cfg.mk("channels", 45)
        n_layers = self.cfg.mk("n_blocks", 10 if s == 4 else 16)

        v = sai_to_views(x[..., 0], a)
        b, _, _, h, w = v.shape
        n = a * a
        img = v.reshape(b * n, h, w, 1).astype(dt)
        feat = lrelu2(conv(fn, 3, padding=1, dtype=dt, name="conv0")(img))

        fup, sr = _Stage(a, fn, fn if s == 4 else 64, n_layers, dt, name="stage1")(
            feat, img, h, w, b * n
        )
        if s == 4:
            _, sr = _Stage(a, fn, 64, n_layers, dt, name="stage2")(
                fup, sr, 2 * h, 2 * w, b * n
            )
        out = sr.reshape(b, a, a, h * s, w * s)
        return views_to_sai(out, a)[..., None].astype(jnp.float32)
