"""EfficientLFNetV6 / V6.1 — the true V6-line architectures.

Faithful TPU re-designs of MyEfficientLFNetV6.py / MyEfficientLFNetV6_1.py
(56ch x 8 LF-VSSM blocks with a 2-way bidirectional scan, EPI branch on
the shallow features, cross-representation fusion + spectral attention,
4/4 progressive fusion, pixel-shuffle reconstruction with a learnable 0.5
output scale). Despite the two files' docstrings, both reference models
hard-code the audited knobs (channels 56, n_blocks 8, d_state 16,
expand 1.25, 2-way scan — MyEfficientLFNetV6.py:112-117); the whole
architectural difference between them is:

- V6.0: LayerNorm AFTER the block fusion conv plus a top-level
  ``fuse_norm`` after progressive fusion (V6.py:154, 391, 404-410);
  spectral ``freq_weight`` init 0.1 (V6.py:334).
- V6.1: pre-norm LayerNorm BEFORE the block branches, no post-fusion
  norms (V6_1.py:385-387, 404-415); ``freq_weight`` init 0.5
  (V6_1.py:330).

That is exactly the 112-parameter gap between their counts (557,628 vs
557,516 with the FastConvSSM fallback — asserted in
tests/test_efficient_family.py).

Two SSM implementations, like the reference's mamba_ssm/FastConvSSM split
(V6.py:40-60): ``ssm_impl='mamba'`` (default; the TPU selective scan) or
``ssm_impl='conv'`` (the Linear -> depthwise conv1d -> SiLU fallback,
used for torch weight-transfer parity).
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
from lfsr_tpu.models.efficient_lfnet_v5 import FastConvSSM
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


class _LocalPixelEnhancement(nn.Module):
    """x + lrelu(pw(dw(x))) (V6.py:510-523)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        y = conv(self.feats, 3, padding=1, groups=self.feats, use_bias=False,
                 name="dw", dtype=dt)(x)
        y = conv(self.feats, 1, use_bias=False, name="pw", dtype=dt)(y)
        return x + lrelu(y)


class _MultiScaleEfficient(nn.Module):
    """Channel-split 1/3/5/7 local branch (V6.py:479-507)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats // 4
        dt = self.dtype
        parts = [
            conv(c, 1, use_bias=False, name="conv1", dtype=dt)(x[..., :c]),
            conv(c, 3, padding=1, groups=c, use_bias=False, name="conv3",
                 dtype=dt)(x[..., c : 2 * c]),
            conv(c, 5, padding=2, groups=c, use_bias=False, name="conv5",
                 dtype=dt)(x[..., 2 * c : 3 * c]),
            conv(self.feats - 3 * c, 7, padding=3, groups=self.feats - 3 * c,
                 use_bias=False, name="conv7", dtype=dt)(x[..., 3 * c :]),
        ]
        y = jnp.concatenate(parts, -1)
        return lrelu(conv(self.feats, 1, use_bias=False, name="pw", dtype=dt)(y)) + x


class _Scan2(nn.Module):
    """2-way bidirectional scan through one shared SSM (V6.py:419-476).

    Raster + reversed-raster sequences stacked on the batch axis so the
    shared LayerNorm + SSM run once on [2B, L, C]."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    ssm_impl: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = self.dtype
        fwd = x.reshape(b, h * w, c)
        seqs = jnp.concatenate([fwd, fwd[:, ::-1]], axis=0)
        seqs = nn.LayerNorm(dtype=dt, name="norm")(seqs)
        if self.ssm_impl == "conv":
            out = FastConvSSM(c, self.d_conv, self.expand, dt, name="ssm")(seqs)
        else:
            out = Mamba(
                d_model=c, d_state=self.d_state, d_conv=self.d_conv,
                expand=self.expand, dtype=dt, name="ssm",
            )(seqs)
        y0 = out[:b].reshape(b, h, w, c)
        y1 = out[b:][:, ::-1].reshape(b, h, w, c)
        fused = conv(c, 1, use_bias=False, name="dir_fuse", dtype=dt)(
            jnp.concatenate([y0, y1], -1)
        )
        scale = self.param("scale", nn.initializers.constant(0.1), (1,))
        return x + scale * fused


class _V6Block(nn.Module):
    """LF-VSSM block. ``pre_norm`` selects the V6.1 layout (norm before
    the branches, V6_1.py:385-415) vs the V6.0 one (norm after the fusion
    conv, V6.py:389-416)."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    ssm_impl: str
    pre_norm: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        xin = x
        if self.pre_norm:
            xin = nn.LayerNorm(dtype=dt, name="pre_norm")(x)
        local = _MultiScaleEfficient(self.feats, dt, name="local")(xin)
        glob = _Scan2(self.feats, self.d_state, self.d_conv, self.expand,
                      self.ssm_impl, dt, name="global")(xin)
        fused = conv(self.feats, 1, use_bias=False, name="fuse", dtype=dt)(
            jnp.concatenate([local, glob], -1)
        )
        if not self.pre_norm:
            fused = nn.LayerNorm(dtype=dt, name="fuse_norm")(fused)
        att = ECA(dtype=dt, name="attention")(fused)
        rs = self.param("res_scale", nn.initializers.constant(0.2), (1,))
        return x + rs * att


class _EPIBranch(nn.Module):
    """Horizontal/vertical EPI depthwise (1,7)/(7,1) convs (V6.py:265-314)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats
        dt = self.dtype
        eh = conv(c, (1, 7), padding=(0, 3), groups=c, use_bias=False,
                  name="epi_h_dw", dtype=dt)(x)
        eh = conv(c, 1, use_bias=False, name="epi_h_pw", dtype=dt)(lrelu(eh))
        ev = conv(c, (7, 1), padding=(3, 0), groups=c, use_bias=False,
                  name="epi_v_dw", dtype=dt)(x)
        ev = conv(c, 1, use_bias=False, name="epi_v_pw", dtype=dt)(lrelu(ev))
        fused = conv(c, 1, use_bias=False, name="fuse", dtype=dt)(
            jnp.concatenate([eh, ev], -1)
        )
        scale = self.param("scale", nn.initializers.constant(0.3), (1,))
        return x + scale * fused


class _SpectralAttention(nn.Module):
    """FFT magnitude weighting + 3x3 spatial mix (V6.py:320-362)."""

    feats: int
    freq_init: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        H, W = x.shape[1], x.shape[2]
        fw = self.param(
            "freq_weight", nn.initializers.constant(self.freq_init),
            (self.feats,),
        )
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        xf = xf * (1.0 + fw.astype(jnp.float32))
        enh = jnp.fft.irfft2(xf, s=(H, W), axes=(1, 2), norm="ortho").astype(dt)
        enh = conv(self.feats, 3, padding=1, use_bias=False,
                   name="spatial_mix", dtype=dt)(enh)
        scale = self.param("scale", nn.initializers.constant(0.2), (1,))
        return x + scale * enh


def v6_loss_builder(cfg: Config):
    """Charbonnier(1e-6) + 0.1 FFT + 0.005 Sobel-magnitude (V6.py:582-627)."""
    eps = cfg.mk("charbonnier_eps", 1e-6)
    wf = cfg.mk("fft_weight", 0.1)
    wg = cfg.mk("grad_weight", 0.005)

    def loss(sr, hr):
        return (
            losses.charbonnier(sr, hr, eps)
            + wf * losses.fft_magnitude_l1(sr, hr)
            + wg * losses.sobel_magnitude_l1(sr, hr)
        )

    return loss


class _V6Base(nn.Module):
    cfg: Config
    pre_norm: bool      # V6.1 layout when True
    freq_init: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        a = cfg.angRes
        s = cfg.scale_factor
        dt = jnp.dtype(cfg.compute_dtype)
        c = cfg.mk("channels", 56)
        n_blocks = cfg.mk("n_blocks", 8)
        d_state = cfg.mk("d_state", 16)
        d_conv = cfg.mk("d_conv", 4)
        expand = cfg.mk("expand", 1.25)
        ssm_impl = cfg.mk("ssm_impl", "mamba")

        up = bicubic_up(x, s)
        h, w = x.shape[1], x.shape[2]
        macpi = cfg.mk("use_macpi", True) and h % a == 0 and w % a == 0
        xin = x
        if macpi:
            xin = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        xin = xin.astype(dt)

        shallow = conv(c, 3, padding=1, name="shallow_conv", dtype=dt)(xin)
        shallow = _LocalPixelEnhancement(c, dt, name="shallow_enhance")(shallow)

        feat = shallow
        blocks = []
        for i in range(n_blocks):
            feat = _V6Block(
                c, d_state, d_conv, expand, ssm_impl, self.pre_norm, dt,
                name=f"block_{i}",
            )(feat)
            blocks.append(feat)

        feat_epi = _EPIBranch(c, dt, name="epi_branch")(shallow)

        cross = conv(c, 1, use_bias=False, name="cross_fuse", dtype=dt)(
            jnp.concatenate([feat, feat_epi], -1)
        )
        cross = _SpectralAttention(c, self.freq_init, dt, name="spectral_attn")(cross)

        half = n_blocks // 2
        early = conv(c, 1, use_bias=False, name="fuse_early", dtype=dt)(
            jnp.concatenate(blocks[:half], -1)
        )
        late = conv(c, 1, use_bias=False, name="fuse_late", dtype=dt)(
            jnp.concatenate(blocks[half:], -1)
        )
        fused = conv(c, 1, use_bias=False, name="fuse_final", dtype=dt)(
            jnp.concatenate([early, late], -1)
        )
        if not self.pre_norm:  # V6.0 only (V6.py:218-223)
            fused = nn.LayerNorm(dtype=dt, name="fuse_norm")(fused)

        feat = fused + cross + shallow

        feat = lrelu(conv(c, 3, padding=1, use_bias=False, name="refine_conv",
                          dtype=dt)(feat))
        for i in range(max(1, s // 2)):
            r = 2 if s in (2, 4) else s
            feat = conv(c * r * r, 3, padding=1, use_bias=False,
                        name=f"up_{i}", dtype=dt)(feat)
            feat = lrelu(pixel_shuffle(feat, r))
            if s not in (2, 4):
                break
        if macpi:
            feat = macpi_to_sai(feat.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        out = conv(1, 3, padding=1, name="output_conv", dtype=dt)(feat)
        out_scale = self.param("output_scale", nn.initializers.constant(0.5), (1,))
        return (out * out_scale).astype(jnp.float32) + up


@register_model("EfficientLFNetV6", loss=v6_loss_builder)
class EfficientLFNetV6(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _V6Base(self.cfg, pre_norm=False, freq_init=0.1, name="core")(
            x, train
        )


@register_model("EfficientLFNetV6_1", loss=v6_loss_builder)
class EfficientLFNetV6_1(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _V6Base(self.cfg, pre_norm=True, freq_init=0.5, name="core")(
            x, train
        )
