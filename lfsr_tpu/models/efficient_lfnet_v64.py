"""EfficientLFNetV64 — the v6.4 challenge model (check_efficiency_official
default, MyEfficientLFNetV6_4.py).

64 channels x 8 LF-VSSM blocks: pre-LN dual branch (all-conv3 multi-scale
local || 2-way raster SS2D through one shared Mamba with **frozen A_log/D**,
V6_4:576-640) -> fuse -> channel attention; then the ultra-efficient
dilated EPI branch (:283-343), CASAI 2-input fusion (:390-414),
degradation modulation (:416-437), semantic attention (:439-470), adaptive
spectral attention (FFT magnitude gate, :472-503), 8-block concat fusion +
LayerNorm (:139-140, 212-220), depthwise-separable x2x2 upsampler, bicubic
global residual. Loss: Charbonnier(1e-6) + 0.1 FFT + 0.005 gradient
variance + 0.01 angular consistency (:660-720).

The selective scan is the TPU-parallel/Pallas implementation; 2-way raster
scans share the Mamba weights by invoking one module on a stacked
[2B, L, C] batch (forward + reversed raster) instead of two kernel calls.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.ssm import Mamba
from lfsr_tpu.models.lfmambax import ECA, MultiScaleLocal
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


def _dw(feats, kernel=3, dilation=(1, 1), padding=None, dtype=None):
    if padding is None:
        padding = tuple(d * (k - 1) // 2 for k, d in zip(
            kernel if isinstance(kernel, tuple) else (kernel, kernel),
            dilation,
        ))
    return conv(feats, kernel, dilation=dilation, padding=padding, groups=feats,
                use_bias=False, dtype=dtype)


class BidirectionalSS2D(nn.Module):
    """2-way raster scan through one shared Mamba (V6_4:576-640)."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        fwd = x.reshape(b, h * w, c)
        rev = fwd[:, ::-1]
        seq = jnp.concatenate([fwd, rev], axis=0)  # [2B, L, C]
        seq = nn.LayerNorm(dtype=self.dtype)(seq)
        out = Mamba(
            d_model=c,
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expand,
            freeze_state_params=True,
            dtype=self.dtype,
            name="mamba",
        )(seq)
        y0 = out[:b].reshape(b, h, w, c)
        y1 = out[b:][:, ::-1].reshape(b, h, w, c)
        fused = conv(c, 1, use_bias=False, dtype=self.dtype)(
            jnp.concatenate([y0, y1], -1)
        )
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * fused


class LFVSSMBlockV64(nn.Module):
    feats: int
    d_state: int
    d_conv: int
    expand: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        xn = nn.LayerNorm(dtype=dt)(x)
        local = MultiScaleLocal(self.feats, dt)(xn)
        glob = BidirectionalSS2D(self.feats, self.d_state, self.d_conv, self.expand, dt)(xn)
        y = conv(self.feats, 1, use_bias=False, dtype=dt)(jnp.concatenate([local, glob], -1))
        y = ECA(dtype=dt)(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        rs = self.param("res_scale", nn.initializers.constant(0.2), (1,))
        return x + rs * y


class EPIBranchV64(nn.Module):
    """Dilated depthwise EPI branch + depth modulation (V6_4:283-343)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, c, a = self.dtype, self.feats, self.ang
        eh = _dw(c, (1, 3), (1, a), (0, a), dt)(x)
        eh = conv(c, 1, use_bias=False, dtype=dt)(lrelu(eh))
        ev = _dw(c, (3, 1), (a, 1), (a, 0), dt)(x)
        ev = conv(c, 1, use_bias=False, dtype=dt)(lrelu(ev))
        epi = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([eh, ev], -1))
        dm = jnp.mean(epi, axis=(1, 2), keepdims=True)
        dm = lrelu(conv(c // 4, 1, use_bias=False, dtype=dt)(dm))
        dm = nn.sigmoid(conv(c, 1, use_bias=False, dtype=dt)(dm))
        scale = self.param("scale", nn.initializers.constant(0.3), (1,))
        return x + scale * (epi * dm)


class SpectralAttentionV64(nn.Module):
    """FFT magnitude gate with per-channel frequency conv (V6_4:472-503)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats
        xf = x.astype(jnp.float32)
        spec = jnp.fft.rfft2(xf, axes=(1, 2), norm="ortho")
        mag = jnp.abs(spec)
        b, hf, wf, _ = mag.shape
        flat = mag.reshape(b, hf * wf, c)
        # depthwise conv1d over the flattened frequency axis
        k = self.param("freq_kernel", nn.initializers.lecun_normal(), (5, 1, c))
        fb = self.param("freq_bias", nn.initializers.zeros, (c,))
        import jax

        fw = jax.lax.conv_general_dilated(
            flat, k, (1,), [(2, 2)],
            dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=c,
        ) + fb
        gate = nn.sigmoid(fw).reshape(b, hf, wf, c)
        spec = spec * (1.0 + gate)
        enhanced = jnp.fft.irfft2(spec, s=(x.shape[1], x.shape[2]), axes=(1, 2), norm="ortho")
        enhanced = conv(c, 1, use_bias=False, dtype=self.dtype)(enhanced.astype(self.dtype))
        scale = self.param("scale", nn.initializers.constant(0.2), (1,))
        return x + scale * enhanced


@register_model("EfficientLFNetV64", loss=losses.composite_v64_builder)
class EfficientLFNetV64(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 64)
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

        # Stage 1: shallow conv + local pixel enhancement (V6_4:94-97)
        shallow = conv(c, 3, padding=1, dtype=dt)(xin)
        enh = lrelu(conv(c, 1, use_bias=False, dtype=dt)(_dw(c, dtype=dt)(shallow)))
        shallow = shallow + enh

        BlockCls = (
            nn.remat(LFVSSMBlockV64, static_argnums=(2,))
            if self.cfg.mk("remat", True) and train
            else LFVSSMBlockV64
        )
        feat = shallow
        blocks = []
        for i in range(n_blocks):
            feat = BlockCls(c, d_state, d_conv, expand, dt, name=f"block_{i}")(feat, train)
            blocks.append(feat)

        feat_epi = EPIBranchV64(c, a, dt)(feat)

        # CASAI 2-input fusion (V6_4:390-414)
        cat2 = jnp.concatenate([feat, feat_epi], -1)
        gate = nn.sigmoid(conv(c, 1, dtype=dt)(jnp.mean(cat2, axis=(1, 2), keepdims=True)))
        fused2 = conv(c, 1, use_bias=False, dtype=dt)(cat2) * gate
        fused2 = conv(c, 1, use_bias=False, dtype=dt)(fused2)
        casai_scale = self.param("casai_scale", nn.initializers.constant(0.3), (1,))
        ff = feat + casai_scale * fused2

        # degradation modulation (V6_4:416-437)
        dg = jnp.mean(ff, axis=(1, 2), keepdims=True)
        dg = nn.relu(conv(c // 4, 1, dtype=dt)(dg))
        dg = nn.sigmoid(conv(c, 1, dtype=dt)(dg))
        deg_scale = self.param("deg_scale", nn.initializers.constant(0.2), (1,))
        ff = ff * (1.0 + deg_scale * dg)

        # semantic attention (V6_4:439-470)
        sm = jnp.mean(ff, axis=(1, 2), keepdims=True)
        sm = nn.relu(conv(max(c // 8, 16), 1, dtype=dt)(sm))
        sm = nn.sigmoid(conv(c, 1, dtype=dt)(sm))
        sem_scale = self.param("sem_scale", nn.initializers.constant(0.3), (1,))
        ff = ff + sem_scale * conv(c, 1, use_bias=False, dtype=dt)(ff * sm)

        ff = SpectralAttentionV64(c, dt)(ff)

        # unified block fusion (V6_4:139-140, 212-220)
        fused = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks, -1))
        fused = nn.LayerNorm(dtype=dt)(fused)
        feat = fused + ff + shallow

        # reconstruction (V6_4:145-155, 224-231). V6.5 deepens this to
        # THREE dw+pw layers (MyEfficientLFNetV6_5.py:142-156) — the
        # refine_layers knob; intermediate layers carry their own lrelu,
        # the final one shares the refine_act below like the reference.
        for _ in range(self.cfg.mk("refine_layers", 1) - 1):
            feat = lrelu(conv(c, 1, use_bias=False, dtype=dt)(_dw(c, dtype=dt)(feat)))
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
