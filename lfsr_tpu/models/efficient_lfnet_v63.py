"""EfficientLFNetV63 — the v6.3 challenge model (MyEfficientLFNetV6_3.py),
the FLOPs rescue of V6.2 (52.79 G -> ~17 G per its docstring:6-11).

56 channels x 8 "Optimized" LF-VSSM blocks: the local branch is the 4-way
channel-split conv1/conv3/conv5/conv5 multi-scale (MyEfficientLFNetV6_3.py:
615-640, conv7 demoted to conv5), the global branch the 2-way raster SS2D
through one shared Mamba with frozen A_log/D (:564-612). Distinctives vs
V6.4 (efficient_lfnet_v64.py):

- DUAL depth-aware EPI branches operating in the ANGULAR domain — each
  macro-pixel's A x A view patch is convolved with depthwise (1,3)/(3,1)
  kernels (:369-427), one branch fed the shallow features, one the deep.
- CASAI fusion takes THREE inputs (sai, epi_shallow, epi_deep) with a
  1x1 local refine (:342-365).
- Semantic attention keeps a 1x1 local refine on the guided features
  (:453-479).
- Progressive early/late/final block fusion (blocks 0-3 / 4-7 / both,
  :139-144, 212-220) instead of V6.4's single 8-block concat.
- The depthwise-separable UltraEfficientUpsampler (:287-336) — the
  component whose absence kept the round-3 alias 74,841 params over the
  reference; here it is the same dw3+pw(4c)+PixelShuffle(2) stage pair
  the V64 implementation already uses.

Parameter parity with the reference file instantiated under a
parameter-exact mamba_ssm shim: 408,494 exactly
(tests/test_efficient_family.py). Loss: Charbonnier + FFT + gradient
variance + angular consistency (:676-745), shared with V6.4.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.lfmambax import ECA
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.models.efficient_lfnet_v64 import BidirectionalSS2D, SpectralAttentionV64, _dw
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


class MultiScaleConv5Block(nn.Module):
    """4-way channel-split local branch: 1x1 / dw3 / dw5 / dw5 (V6_3:615-640)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats // 4
        dt = self.dtype
        y1 = conv(c, 1, use_bias=False, dtype=dt)(x[..., :c])
        y3 = _dw(c, 3, dtype=dt)(x[..., c : 2 * c])
        # the two dw5 branches are per-channel convs over disjoint channel
        # ranges -> one depthwise conv over the upper 2c channels
        y5 = conv(2 * c, 5, padding=2, groups=2 * c, use_bias=False, dtype=dt)(x[..., 2 * c :])
        y = jnp.concatenate([y1, y3, y5], axis=-1)
        return lrelu(conv(self.feats, 1, use_bias=False, dtype=dt)(y)) + x


class AngularEPIBranch(nn.Module):
    """Depth-aware EPI branch in the angular domain (V6_3:369-427).

    Each macro-pixel's A x A angular patch is depthwise-convolved along
    the horizontal / vertical view axes ((1,3) and (3,1) kernels, no
    crossing of macro-pixel boundaries), then 1x1-mixed, fused, and
    modulated by a global depth gate.
    """

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, c, a = self.dtype, self.feats, self.ang
        b, hh, ww, _ = x.shape
        h, w = hh // a, ww // a
        # MacPI [B, h*a, w*a, C] -> angular patches [B*h*w, a, a, C]
        ang = x.reshape(b, h, a, w, a, c).transpose(0, 1, 3, 2, 4, 5)
        ang = ang.reshape(b * h * w, a, a, c)
        eh = conv(c, 1, use_bias=False, dtype=dt)(
            lrelu(conv(c, (1, 3), padding=(0, 1), groups=c, use_bias=False, dtype=dt)(ang))
        )
        ev = conv(c, 1, use_bias=False, dtype=dt)(
            lrelu(conv(c, (3, 1), padding=(1, 0), groups=c, use_bias=False, dtype=dt)(ang))
        )
        epi = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([eh, ev], -1))
        epi = epi.reshape(b, h, w, a, a, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
        dm = lrelu(conv(c // 4, 1, use_bias=False, dtype=dt)(epi))
        dm = nn.sigmoid(conv(c, 1, use_bias=False, dtype=dt)(dm))
        scale = self.param("scale", nn.initializers.constant(0.3), (1,))
        return x + scale * (epi * dm)


class LFVSSMBlockV63(nn.Module):
    """Pre-LN dual-branch block with the conv5 multi-scale local (V6_3:521-561)."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        xn = nn.LayerNorm(dtype=dt)(x)
        local = MultiScaleConv5Block(self.feats, dt)(xn)
        glob = BidirectionalSS2D(self.feats, self.d_state, self.d_conv, self.expand, dt)(xn)
        y = conv(self.feats, 1, use_bias=False, dtype=dt)(jnp.concatenate([local, glob], -1))
        y = ECA(dtype=dt)(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        rs = self.param("res_scale", nn.initializers.constant(0.2), (1,))
        return x + rs * y


@register_model("EfficientLFNetV6_3", loss=losses.composite_v64_builder)
class EfficientLFNetV63(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 56)
        n_blocks = self.cfg.mk("n_blocks", 8)
        d_state = self.cfg.mk("d_state", 16)
        d_conv = self.cfg.mk("d_conv", 4)
        expand = self.cfg.mk("expand", 1.25)

        up = bicubic_up(x, s)
        h, w = x.shape[1], x.shape[2]
        macpi = self.cfg.mk("use_macpi", True) and h % a == 0 and w % a == 0
        xin = x
        if macpi:
            xin = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        xin = xin.astype(dt)

        # Stage 1: shallow conv + local pixel enhancement (V6_3:92-95, 643-653)
        shallow = conv(c, 3, padding=1, dtype=dt)(xin)
        enh = lrelu(conv(c, 1, use_bias=False, dtype=dt)(_dw(c, dtype=dt)(shallow)))
        shallow = shallow + enh

        BlockCls = (
            nn.remat(LFVSSMBlockV63, static_argnums=(2,))
            if self.cfg.mk("remat", True) and train
            else LFVSSMBlockV63
        )
        feat = shallow
        blocks = []
        for i in range(n_blocks):
            feat = BlockCls(c, d_state, d_conv, expand, dt, name=f"block_{i}")(feat, train)
            blocks.append(feat)

        # Stage 2B: dual depth-aware angular EPI branches (V6_3:113-115, 200-203)
        epi_shallow = AngularEPIBranch(c, a, dt, name="epi_shallow")(shallow)
        epi_deep = AngularEPIBranch(c, a, dt, name="epi_deep")(feat)

        # Stage 3: CASAI 3-input fusion with 1x1 local refine (V6_3:342-365)
        cat3 = jnp.concatenate([feat, epi_shallow, epi_deep], -1)
        gate = nn.sigmoid(conv(c, 1, dtype=dt)(jnp.mean(cat3, axis=(1, 2), keepdims=True)))
        fused3 = conv(c, 1, use_bias=False, dtype=dt)(cat3) * gate
        fused3 = conv(c, 1, use_bias=False, dtype=dt)(fused3)
        casai_scale = self.param("casai_scale", nn.initializers.constant(0.3), (1,))
        ff = feat + casai_scale * fused3

        # Stage 4: degradation modulation (V6_3:430-450)
        dg = jnp.mean(ff, axis=(1, 2), keepdims=True)
        dg = nn.relu(conv(c // 4, 1, dtype=dt)(dg))
        dg = nn.sigmoid(conv(c, 1, dtype=dt)(dg))
        deg_scale = self.param("deg_scale", nn.initializers.constant(0.2), (1,))
        ff = ff * (1.0 + deg_scale * dg)

        # Stage 5: semantic attention with 1x1 local refine (V6_3:453-479)
        sm = jnp.mean(ff, axis=(1, 2), keepdims=True)
        sm = nn.relu(conv(max(c // 8, 16), 1, dtype=dt)(sm))
        sm = nn.sigmoid(conv(c, 1, dtype=dt)(sm))
        sem_scale = self.param("sem_scale", nn.initializers.constant(0.3), (1,))
        ff = ff + sem_scale * conv(c, 1, use_bias=False, dtype=dt)(ff * sm)

        # Stage 6: adaptive spectral attention (V6_3:482-518, freq_kernel 5)
        ff = SpectralAttentionV64(c, dt)(ff)

        # Stage 7: progressive early/late/final fusion (V6_3:139-144, 212-220)
        early = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks[: n_blocks // 2], -1))
        late = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks[n_blocks // 2 :], -1))
        fused = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([early, late], -1))
        fused = nn.LayerNorm(dtype=dt)(fused)
        feat = fused + ff + shallow

        # Stage 8: ultra-efficient reconstruction (V6_3:148-159, 224-231, 287-336)
        feat = lrelu(conv(c, 1, use_bias=False, dtype=dt)(_dw(c, dtype=dt)(feat)))
        feat = ECA(reduction=16, dtype=dt)(feat)
        for _ in range(s // 2):
            feat = lrelu(_dw(c, dtype=dt)(feat))
            feat = conv(c * 4, 1, use_bias=False, dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, 2))
        if macpi:
            feat = macpi_to_sai(feat.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        out = conv(1, 3, padding=1, dtype=dt)(feat)
        out_scale = self.param("out_scale", nn.initializers.constant(0.5), (1,))
        return (out * out_scale).astype(jnp.float32) + up
