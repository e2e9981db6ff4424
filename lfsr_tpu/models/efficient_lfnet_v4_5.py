"""EfficientLFNetV4_5 — the v4.5 production model as a real architecture
(MyEfficientLFNetV4_5.py, the reference train.sh /
train_v4_5_championship.sh default).

64 channels x 8 MambaLF blocks. Each block (no pre-norm, no residual
scale — :134-148):
  MultiScaleSpatial (1/3/5/7 depthwise split + pointwise + BatchNorm +
  LeakyReLU, residual, :247-272)
  || SSM branch:
     - 'mamba' (reference SS2DBlock, :151-205): 4 directional raster
       scans through ONE shared Mamba (d_state 16, expand 2.0) — stacked
       on the batch axis here so the scan runs once on [4B, L, C];
     - 'conv' (reference FastConvSSM, :208-244): BatchNorm -> GELU-gated
       1x1 expansion -> multi-dilation (1/2/4/8) depthwise -> SiLU gate.
  -> fuse 2C->C -> channel attention -> + x.

Progressive 4/4 early/late fusion (:55-60, 92-97), plain conv refine,
full-conv PixelShuffle x2x2 upsampler (:302-326), bicubic global
residual. MacPI is OFF by default (:39, unlike V5+). Loss = L1 + 0.05 FFT
(:329-338). EPSW windowing is mentioned only in the v4.5 changelog; the
code lives in V4_3 and was dropped from this file.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.efficient_lfnet_v5 import CrossScan4
from lfsr_tpu.models.lfmambax import ECA
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


def _dwd(feats, dilation, dtype):
    return conv(feats, 3, dilation=dilation, padding=dilation, groups=feats,
                use_bias=False, dtype=dtype)


class V45FastConvSSM(nn.Module):
    """Gated multi-dilation conv fallback (V4_5:208-244). Image-domain
    (works on [B,H,W,C]), unlike V5's sequence-domain fallback."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, c = self.dtype, self.feats
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
        # exact (erf) GELU — torch nn.GELU default, not the tanh approximation
        g = nn.gelu(conv(2 * c, 1, use_bias=False, dtype=dt)(y), approximate=False)
        gate, y = g[..., :c], g[..., c:]
        ms = jnp.concatenate(
            [_dwd(c, d, dt)(y) for d in (1, 2, 4, 8)], -1
        )
        y = conv(c, 1, use_bias=False, dtype=dt)(ms)
        y = y * nn.silu(gate)
        y = conv(c, 1, use_bias=False, dtype=dt)(y)
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * y


class MultiScaleSpatial(nn.Module):
    """1/3/5/7 depthwise split + pointwise + BN + LeakyReLU (V4_5:247-272)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = self.feats // 4
        parts = [
            conv(c, 1, use_bias=False, dtype=dt)(x[..., :c]),
            conv(c, 3, padding=1, groups=c, use_bias=False, dtype=dt)(x[..., c : 2 * c]),
            conv(c, 5, padding=2, groups=c, use_bias=False, dtype=dt)(x[..., 2 * c : 3 * c]),
            conv(self.feats - 3 * c, 7, padding=3, groups=self.feats - 3 * c,
                 use_bias=False, dtype=dt)(x[..., 3 * c :]),
        ]
        y = conv(self.feats, 1, use_bias=False, dtype=dt)(jnp.concatenate(parts, -1))
        y = nn.BatchNorm(use_running_average=not train, dtype=dt)(y)
        return lrelu(y) + x


class MambaLFBlock(nn.Module):
    """Dual-branch block (V4_5:134-148)."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    ssm_impl: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        local = MultiScaleSpatial(self.feats, dt)(x, train)
        if self.ssm_impl == "conv":
            glob = V45FastConvSSM(self.feats, dt)(x, train)
        else:
            glob = CrossScan4(
                self.feats, self.d_state, self.d_conv, self.expand, "mamba", dt
            )(x)
        y = conv(self.feats, 1, use_bias=False, dtype=dt)(
            jnp.concatenate([local, glob], -1)
        )
        return ECA(dtype=dt)(y) + x


@register_model("EfficientLFNetV4_5", loss=losses.l1_fft_builder)
class EfficientLFNetV4_5(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        a = cfg.angRes
        s = cfg.scale_factor
        dt = jnp.dtype(cfg.compute_dtype)
        c = cfg.mk("channels", 64)
        n_blocks = cfg.mk("n_blocks", 8)
        d_state = cfg.mk("d_state", 16)
        d_conv = cfg.mk("d_conv", 4)
        expand = cfg.mk("expand", 2.0)
        ssm_impl = cfg.mk("ssm_impl", "mamba")

        up = bicubic_up(x, s)
        h, w = x.shape[1], x.shape[2]
        # MacPI is optional and OFF by default (V4_5:39)
        macpi = cfg.mk("use_macpi", False) and h % a == 0 and w % a == 0
        xin = x
        if macpi:
            xin = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        xin = xin.astype(dt)

        # Shallow: conv + LeakyReLU + LocalPixelEnhancement-with-BN
        feat = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt, name="shallow")(xin))
        enh = conv(c, 3, padding=1, groups=c, use_bias=False, dtype=dt)(feat)
        enh = nn.BatchNorm(use_running_average=not train, dtype=dt)(enh)
        feat = feat + conv(c, 1, use_bias=False, dtype=dt)(lrelu(enh))
        shallow = feat

        early, late = [], []
        for i in range(n_blocks):
            feat = MambaLFBlock(
                c, d_state, d_conv, expand, ssm_impl, dt, name=f"block_{i}"
            )(feat, train)
            (early if i < n_blocks // 2 else late).append(feat)

        e = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(early, -1))
        l = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(late, -1))
        feat = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([e, l], -1))
        feat = feat + shallow

        feat = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(feat))
        stages = [2] * (s // 2) if s in (2, 4) else [s]
        for r in stages:
            feat = conv(c * r * r, 3, padding=1, use_bias=False, dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, r))
        if macpi:
            feat = macpi_to_sai(feat.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        out = conv(1, 3, padding=1, dtype=dt, name="out")(feat)
        return out.astype(jnp.float32) + up
