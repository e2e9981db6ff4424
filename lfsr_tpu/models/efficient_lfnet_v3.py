"""EfficientLFNetV3 — the v3.0 "championship" model (MyEfficientLFNetV3.py).

80 channels x 6 LGFM blocks, each = DGCE (Ghost-module extraction with
dilated-depthwise spatial gate + SE channel gate, :218-278) -> ESAM
(decomposed (2A+1)x1 + 1x(2A+1) large-kernel attention, :281-330) -> ECAM
(dual-pooled 1-D channel-correlation attention, :332-376); GhostNet cheap
features throughout (:166-216), dense 6-block aggregation, pixel-shuffle
upsampler, bicubic residual. Loss: L1 + 0.05 FFT (+0.02 edge) (:420-439).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.cnn_baselines import bicubic_up


class GhostModule(nn.Module):
    """Primary 1x1 conv + cheap depthwise expansion (V3:166-216)."""

    features: int
    kernel: int = 3
    ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        prim_c = self.features // self.ratio
        cheap_c = self.features - prim_c
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=dt, name=name
        )
        prim = lrelu(bn("bn_p")(conv(prim_c, 1, use_bias=False, dtype=dt)(x)))
        cheap = bn("bn_c")(
            conv(cheap_c, self.kernel, padding=self.kernel // 2, groups=prim_c,
                 use_bias=False, dtype=dt)(prim)
        )
        return jnp.concatenate([prim, cheap], -1)


class _DGCE(nn.Module):
    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, a, dt = self.feats, self.ang, self.dtype
        feat = lrelu(GhostModule(c, dtype=dt)(x, train))
        sg = conv(c, 3, padding=a, dilation=a, groups=c, use_bias=False, dtype=dt)(feat)
        sg = nn.sigmoid(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=dt)(sg))
        feat = feat * sg
        cg = jnp.mean(feat, axis=(1, 2), keepdims=True)
        hidden = max(c // 4, 16)
        cg = nn.relu(conv(hidden, 1, dtype=dt)(cg))
        cg = nn.sigmoid(conv(c, 1, dtype=dt)(cg))
        return feat * cg + x


class _ESAM(nn.Module):
    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c, dt = self.feats, self.dtype
        k = 2 * self.ang + 1
        h = conv(c, (1, k), padding=(0, k // 2), groups=c, use_bias=False, dtype=dt)(x)
        v = conv(c, (k, 1), padding=(k // 2, 0), groups=c, use_bias=False, dtype=dt)(x)
        spatial = conv(c, 1, use_bias=False, dtype=dt)(h + v)
        attn = nn.relu(conv(c // 4, 1, use_bias=False, dtype=dt)(spatial))
        attn = nn.sigmoid(conv(c, 1, use_bias=False, dtype=dt)(attn))
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * (x * attn)


class _ECAM(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats
        k = max(3, c // 8)
        k += (k + 1) % 2
        kern = self.param("conv1d", nn.initializers.lecun_normal(), (k, 1, 1))
        avg = jnp.mean(x, axis=(1, 2))[:, :, None]  # [B, C, 1]
        mx = jnp.max(x, axis=(1, 2))[:, :, None]

        def c1d(t):  # depthwise 1-D conv over the channel axis
            return jax.lax.conv_general_dilated(
                t.astype(jnp.float32), kern, (1,), [(k // 2, k // 2)],
                dimension_numbers=("NLC", "LIO", "NLC"),
            )

        y = nn.sigmoid(c1d(avg) + c1d(mx)).astype(x.dtype)  # [B, C, 1]
        return x * y[..., 0][:, None, None, :]


@register_model("EfficientLFNetV3", loss=losses.l1_fft_builder)
class EfficientLFNetV3(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 80)

        up = bicubic_up(x, s)
        feat = GhostModule(c, dtype=dt)(x.astype(dt), train)
        feat = GhostModule(c, dtype=dt)(lrelu(feat), train)
        shallow = feat

        blocks = []
        for i in range(self.cfg.mk("n_blocks", 6)):
            y = _DGCE(c, a, dt)(feat, train)
            y = _ESAM(c, a, dt)(y)
            y = _ECAM(c, dt)(y)
            feat = conv(c, 1, use_bias=False, dtype=dt)(y) + feat
            blocks.append(feat)

        agg = lrelu(conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks, -1)))
        feat = agg + shallow
        feat = lrelu(GhostModule(c, dtype=dt)(feat, train))

        for _ in range(s // 2):
            feat = conv(c * 4, 3, padding=1, use_bias=False, dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, 2))
        out = conv(1, 3, padding=1, dtype=dt)(feat)
        return out.astype(jnp.float32) + up
