"""EfficientLFNetV2 — the team's v2.0 challenge model (547,540 params).

Re-design of MyEfficientLFNet.py (reference v2.0): 54 channels, 5
ProgressiveDisentanglingStages (channel-split spatial / angular / EPI
branches with SE gates, :119-208), LightweightAngularAttention (AxA
stride-A pool -> gated channel mixing -> PixelShuffle expand, :211-275),
MultiScaleEPIBlock (h/v/diagonal depthwise EPI convs, :278-327), RepConv
re-parameterizable blocks (see lfsr_tpu.models.repconv), SAModulator dual
spatial/angular sigmoid modulation (:471-515), pixel-shuffle x2x2
upsampler (:548-582), bicubic global residual; loss = L1 + 0.05*|FFT|
(:585-609).

Deploy mode (``model_kwargs={'deploy': True}``) uses fused single-conv
RepConv blocks; convert trained params with
lfsr_tpu.models.repconv.reparameterize.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.repconv import RepConv
from lfsr_tpu.models.cnn_baselines import bicubic_up


def _se_gate(x, dtype):
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = nn.sigmoid(conv(x.shape[-1], 1, use_bias=True, dtype=dtype)(g))
    return x * g


class _AngularAttention(nn.Module):
    """LightweightAngularAttention (MyEfficientLFNet.py:211-275)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        a, dt, c = self.ang, self.dtype, self.feats
        hidden = max(c // 4, 16)
        ang = conv(c, a, stride=a, use_bias=False, dtype=dt)(x)
        att = conv(hidden, 1, use_bias=False, dtype=dt)(ang)
        att = nn.relu(att)
        att = nn.relu(conv(hidden, 3, padding=1, groups=hidden, use_bias=False, dtype=dt)(att))
        att = conv(c, 1, use_bias=False, dtype=dt)(att)
        ang = ang * nn.sigmoid(att)
        ang = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(ang))
        out = conv(c * a * a, 1, use_bias=False, dtype=dt)(ang)
        out = lrelu(pixel_shuffle(out, a))
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * out


class _MultiScaleEPI(nn.Module):
    """MultiScaleEPIBlock (MyEfficientLFNet.py:278-327)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        a, dt, c = self.ang, self.dtype, self.feats

        def branch(kernel, padding, dilation=(1, 1)):
            y = conv(c, kernel, padding=padding, dilation=dilation, groups=c,
                     use_bias=False, dtype=dt)(x)
            return lrelu(conv(c, 1, use_bias=False, dtype=dt)(y))

        h = branch((1, 2 * a + 1), (0, a))
        v = branch((2 * a + 1, 1), (a, 0))
        d = branch((3, 3), (a, a), dilation=(a, a))
        return lrelu(conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([h, v, d], -1)))


class _SAModulator(nn.Module):
    """Spatial-angular modulation (MyEfficientLFNet.py:471-515)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        a, dt, c = self.ang, self.dtype, self.feats
        s_mod = conv(c, 3, padding=a, dilation=a, groups=c, use_bias=False, dtype=dt)(x)
        s_mod = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=dt)(s_mod)
        s_mod = nn.sigmoid(s_mod)

        # adaptive average pool to a x a
        h, w = x.shape[1], x.shape[2]
        ph, pw = h // a, w // a
        pooled = jnp.mean(
            x.reshape(x.shape[0], a, ph, a, pw, c), axis=(2, 4)
        )
        am = nn.relu(conv(c // 4, 1, use_bias=False, dtype=dt)(pooled))
        am = nn.sigmoid(conv(c, 1, use_bias=False, dtype=dt)(am))
        # nearest-neighbor expand back
        am = jnp.repeat(jnp.repeat(am, ph, axis=1), pw, axis=2)

        wts = nn.softmax(self.param("combine", nn.initializers.constant(0.5), (2,)))
        return x * (wts[0] * s_mod + wts[1] * am)


class _Stage(nn.Module):
    """ProgressiveDisentanglingStage (MyEfficientLFNet.py:119-208)."""

    feats: int
    ang: int
    deploy: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        a, dt, c = self.ang, self.dtype, self.feats
        cs = [c // 3, c // 3, c - 2 * (c // 3)]
        xs, xa, xe = (
            x[..., : cs[0]],
            x[..., cs[0] : cs[0] + cs[1]],
            x[..., cs[0] + cs[1] :],
        )

        fs = RepConv(cs[0], 3, a, self.deploy, dt)(xs, train)
        fs = lrelu(fs)
        fs = conv(cs[0], 3, padding=a, dilation=a, use_bias=False, dtype=dt)(fs)
        fa = _AngularAttention(cs[1], a, dt)(xa)
        fe = _MultiScaleEPI(cs[2], a, dt)(xe)

        fs, fa, fe = _se_gate(fs, dt), _se_gate(fa, dt), _se_gate(fe, dt)
        fused = jnp.concatenate([fs, fa, fe], -1)
        fused = lrelu(conv(c, 1, use_bias=False, dtype=dt)(fused))
        fused = conv(c, 3, padding=a, dilation=a, use_bias=False, dtype=dt)(fused)
        fused = _SAModulator(c, a, dt)(fused, train)
        return fused + x


@register_model("EfficientLFNetV2", loss=losses.l1_fft_builder)
class EfficientLFNetV2(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 54)
        deploy = self.cfg.mk("deploy", False)

        up = bicubic_up(x, s)
        feat = RepConv(c, 3, a, deploy, dt, name="shallow")(x.astype(dt), train)
        shallow = feat
        for i in range(self.cfg.mk("n_stages", 5)):
            feat = _Stage(c, a, deploy, dt, name=f"stage_{i}")(feat, train)
        feat = lrelu(conv(c, 1, use_bias=False, dtype=dt)(feat))
        feat = RepConv(c, 3, a, deploy, dt, name="global_rep")(feat, train) + shallow

        for _ in range(s // 2):
            feat = conv(c * 4, 3, padding=1, use_bias=False, dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, 2))
        out = conv(1, 3, padding=1, use_bias=True, dtype=dt)(feat)
        return out.astype(jnp.float32) + up
