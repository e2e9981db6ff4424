"""EfficientLFNetV5 — the v5.1 cloud-pipeline model (MyEfficientLFNetV5.py).

48 channels x 6 LF-VSSM blocks (multi-scale 1/3/5/7 depthwise local branch
:482-525 || 4-way SS2D cross-scan :387-480), early/late progressive fusion
with LayerNorm (:157-162, 217-231), MacPI processing, learnable 0.5 output
scale, bicubic residual. Used by the reference's run_end_to_end_pipeline.sh
:175 and cloud_train.sh (367,526 params claimed at cloud_train.sh:22).

Two SSM implementations, like the reference's mamba_ssm/FastConvSSM split
(:71-99): ``ssm_impl='mamba'`` (default; TPU-parallel selective scan) or
``ssm_impl='conv'`` (the Linear->depthwise-conv1d->SiLU fallback).

8-fold dihedral TTA at eval (``use_tta=True``; :252-300) — flips/rotations
of the SAI mosaic transform spatial and angular axes together, so
averaging is LF-consistent.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.ssm import Mamba
from lfsr_tpu.models.lfmambax import ECA
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


class FastConvSSM(nn.Module):
    """Conv fallback SSM (V5:71-99): Linear -> depthwise conv1d -> SiLU ->
    Linear over [B, L, C] sequences."""

    channels: int
    d_conv: int
    expand: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, seq):
        import jax

        hidden = int(self.channels * self.expand)
        y = nn.Dense(hidden, dtype=self.dtype)(seq)
        k = self.param("conv_kernel", nn.initializers.lecun_normal(), (self.d_conv, 1, hidden))
        b = self.param("conv_bias", nn.initializers.zeros, (hidden,))
        pad_l = (self.d_conv - 1) // 2
        pad_r = self.d_conv - 1 - pad_l
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), k.astype(self.dtype), (1,), [(pad_l, pad_r)],
            dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=hidden,
        ) + b.astype(self.dtype)
        y = nn.silu(y)
        return nn.Dense(self.channels, dtype=self.dtype)(y)


class CrossScan4(nn.Module):
    """4-way full-channel cross-scan through one shared SSM (V5:387-480).

    All four directional sequences are stacked on the batch axis so the
    shared SSM runs once on [4B, L, C]."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    ssm_impl: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        fwd = x.reshape(b, h * w, c)
        ver = x.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        seqs = jnp.concatenate([fwd, fwd[:, ::-1], ver, ver[:, ::-1]], axis=0)
        seqs = nn.LayerNorm(dtype=self.dtype)(seqs)
        if self.ssm_impl == "conv":
            out = FastConvSSM(c, self.d_conv, self.expand, self.dtype, name="ssm")(seqs)
        else:
            out = Mamba(
                d_model=c, d_state=self.d_state, d_conv=self.d_conv,
                expand=self.expand, dtype=self.dtype, name="ssm",
            )(seqs)
        y0 = out[:b].reshape(b, h, w, c)
        y1 = out[b : 2 * b][:, ::-1].reshape(b, h, w, c)
        y2 = out[2 * b : 3 * b].reshape(b, w, h, c).transpose(0, 2, 1, 3)
        y3 = out[3 * b :][:, ::-1].reshape(b, w, h, c).transpose(0, 2, 1, 3)
        fused = conv(c, 1, use_bias=False, dtype=self.dtype)(
            jnp.concatenate([y0, y1, y2, y3], -1)
        )
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * fused


class _MultiScale1357(nn.Module):
    """Channel-split 1/3/5/7 depthwise local branch (V5:482-525)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats // 4
        dt = self.dtype
        parts = [
            conv(c, 1, use_bias=False, dtype=dt)(x[..., :c]),
            conv(c, 3, padding=1, groups=c, use_bias=False, dtype=dt)(x[..., c : 2 * c]),
            conv(c, 5, padding=2, groups=c, use_bias=False, dtype=dt)(x[..., 2 * c : 3 * c]),
            conv(self.feats - 3 * c, 7, padding=3, groups=self.feats - 3 * c,
                 use_bias=False, dtype=dt)(x[..., 3 * c :]),
        ]
        y = jnp.concatenate(parts, -1)
        return lrelu(conv(self.feats, 1, use_bias=False, dtype=dt)(y)) + x


class _V5Block(nn.Module):
    feats: int
    d_state: int
    d_conv: int
    expand: float
    ssm_impl: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        local = _MultiScale1357(self.feats, dt)(x)
        glob = CrossScan4(self.feats, self.d_state, self.d_conv, self.expand, self.ssm_impl, dt)(x)
        y = conv(self.feats, 1, use_bias=False, dtype=dt)(jnp.concatenate([local, glob], -1))
        y = nn.LayerNorm(dtype=dt)(y)
        y = ECA(dtype=dt)(y)
        rs = self.param("res_scale", nn.initializers.constant(0.2), (1,))
        return x + rs * y


def charbonnier_fft_builder(cfg: Config):
    eps = cfg.mk("charbonnier_eps", 1e-6)
    wf = cfg.mk("fft_weight", 0.05)

    def loss(sr, hr):
        return losses.charbonnier(sr, hr, eps) + wf * losses.fft_magnitude_l1(sr, hr)

    return loss


class _V5Core(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        a = cfg.angRes
        s = cfg.scale_factor
        dt = jnp.dtype(cfg.compute_dtype)
        c = cfg.mk("channels", 48)
        ssm_impl = cfg.mk("ssm_impl", "mamba")

        up = bicubic_up(x, s)
        h, w = x.shape[1], x.shape[2]
        macpi = cfg.mk("use_macpi", True) and h % a == 0 and w % a == 0
        xin = x
        if macpi:
            xin = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        xin = xin.astype(dt)

        shallow = conv(c, 3, padding=1, dtype=dt, name="shallow")(xin)
        # LocalPixelEnhancement (V5:530-549): x + pw(act(dw(x)))
        enh = conv(c, 3, padding=1, groups=c, use_bias=False, dtype=dt, name="enh_dw")(shallow)
        enh = conv(c, 1, use_bias=False, dtype=dt, name="enh_pw")(lrelu(enh))
        shallow = shallow + enh

        feat = shallow
        blocks = []
        for i in range(cfg.mk("n_blocks", 6)):
            feat = _V5Block(
                c, cfg.mk("d_state", 16), cfg.mk("d_conv", 4),
                cfg.mk("expand", 1.5), ssm_impl, dt, name=f"block_{i}",
            )(feat)
            blocks.append(feat)

        half = max(1, len(blocks) // 2)  # reference splits 6 blocks 3/3
        early = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks[:half], -1))
        late = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate(blocks[half:], -1))
        fused = conv(c, 1, use_bias=False, dtype=dt)(jnp.concatenate([early, late], -1))
        fused = nn.LayerNorm(dtype=dt)(fused)
        feat = fused + shallow

        feat = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(feat))
        for _ in range(s // 2):
            feat = conv(c * 4, 3, padding=1, use_bias=False, dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, 2))
        if macpi:
            feat = macpi_to_sai(feat.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        out = conv(1, 3, padding=1, dtype=dt, name="out")(feat)
        out_scale = self.param("out_scale", nn.initializers.constant(0.5), (1,))
        return (out * out_scale).astype(jnp.float32) + up

@register_model("EfficientLFNetV5", loss=charbonnier_fft_builder)
class EfficientLFNetV5(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        core = _V5Core(self.cfg, name="core")
        if not self.cfg.mk("use_tta", False) or train:
            return core(x)
        # 8-fold dihedral TTA (V5:252-300); LF-consistent on square SAI.
        # Calling the same module instance reuses one parameter set.
        outs = [core(x)]
        outs.append(core(x[:, :, ::-1])[:, :, ::-1])
        outs.append(core(x[:, ::-1])[:, ::-1])
        t = jnp.swapaxes(x, 1, 2)
        outs.append(jnp.swapaxes(core(t), 1, 2))
        outs.append(core(x[:, ::-1, ::-1])[:, ::-1, ::-1])
        outs.append(jnp.swapaxes(core(t[:, :, ::-1])[:, :, ::-1], 1, 2))
        outs.append(jnp.swapaxes(core(t[:, ::-1])[:, ::-1], 1, 2))
        outs.append(jnp.swapaxes(core(t[:, ::-1, ::-1])[:, ::-1, ::-1], 1, 2))
        return sum(outs) / len(outs)
