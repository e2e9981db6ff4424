"""LF-DFnet — deformable-convolution view alignment.

Re-design of the reference DFnet (DFnet.py:23-272). The reference file is
dead code in the fork — it exports ``Net`` instead of the required
``get_model``/``get_loss`` contract (SURVEY.md §2.5) and depends on an
external CUDA DCN package; here it is registered as ``LF_DFnet`` with the
proper contract and a TPU-native deformable conv.

Structure: shared FeaExtract on side/center views; three cascaded ADAM
blocks that predict per-pixel 3x3 offsets from (side, center) pairs and
deformably align side-view features toward the center (DFnet.py:106-152);
4 IMDB blocks over the 4-stage concatenation; per-view pixel-shuffle head
+ bicubic residual.

The deformable conv is a 9-tap bilinear-gather: for each kernel tap, the
feature map is sampled at (p + p_k + dp_k) with bilinear weights and the
taps are mixed by the conv kernel — pure gathers + matmuls, no custom op.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.dpt import _ResASPPD, _FeaExtractD, _IMDB
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai
from lfsr_tpu.ops.resize import interpolate


def _bilinear_sample_taps(img, yy, xx):
    """img [B,H,W,C]; yy/xx [B,H,W,K] float coords -> [B,H,W,K,C].

    All K kernel taps are gathered in ONE take_along_axis per bilinear
    corner (4 large gathers instead of 4*K small ones — the r5 zoo MFU
    fix: at K=9 the tap-by-tap form spent its time in gather dispatch,
    not flops). DCNv1 zero-padding semantics: corner pixels outside the
    map contribute zero (NOT border-replicate), so samples drifting off
    the edge fade out exactly like the reference CUDA deform_conv."""
    b, h, w, k = yy.shape
    c = img.shape[-1]
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0
    flat = img.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(b, h * w * k)  # [B, HWK]
        vals = jnp.take_along_axis(
            flat, idx[..., None], axis=1
        ).reshape(b, h, w, k, c)
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


class DeformConv3x3(nn.Module):
    """Offset-driven 3x3 deformable conv (DCNv1 semantics, 1 group,
    no bias — the reference CUDA DeformConv has none, DFnet.py:115)."""

    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offsets):
        # x: [B,H,W,C]; offsets: [B,H,W,18] ordered (dy, dx) per tap
        b, h, w, c = x.shape
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(), (9, c, self.feats)
        )
        gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        gy = gy[None, ..., None].astype(jnp.float32)  # [1,H,W,1]
        gx = gx[None, ..., None].astype(jnp.float32)
        taps = jnp.asarray(
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], jnp.float32
        )  # [9, 2] ordered like the offset channels
        off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
        yy = gy + taps[:, 0] + off[..., 0]  # [B,H,W,9]
        xx = gx + taps[:, 1] + off[..., 1]
        sampled = _bilinear_sample_taps(x.astype(jnp.float32), yy, xx)
        # one MXU contraction over (tap, channel) instead of 9 thin ones
        out = jnp.einsum(
            "bhwkc,kcf->bhwf", sampled, kern.astype(jnp.float32)
        )
        return out.astype(x.dtype)


class _ADAMD(nn.Module):
    """Deformable alignment ADAM (DFnet.py:106-152)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, sv, cv):
        # sv: [B, N, h, w, C] (N = A^2 - 1); cv: [B, h, w, C]
        b, n, h, w, c = sv.shape
        dt = self.dtype
        fuse1 = conv(c, 1, dtype=dt, name="conv_1")
        aspp = _ResASPPD(c, dt)
        conv_off = conv(18, 1, dtype=dt, name="conv_off",)
        dcn = DeformConv3x3(c, dt, name="dcn")

        pair = jnp.concatenate(
            [sv, jnp.broadcast_to(cv[:, None], sv.shape)], -1
        ).reshape(b * n, h, w, 2 * c)
        buf = aspp(lrelu(fuse1(pair)))
        off = conv_off(buf)
        aligned = lrelu(dcn(sv.reshape(b * n, h, w, c), off)).reshape(b, n, h, w, c)

        collect = jnp.concatenate(
            [aligned.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c), cv], -1
        )
        fused = conv((n + 1) * c, 1, dtype=dt, name="conv_f1")(collect)
        fused = fused.reshape(b, h, w, n + 1, c).transpose(0, 3, 1, 2, 4)

        pair2 = jnp.concatenate([fused[:, 1:], sv], -1).reshape(b * n, h, w, 2 * c)
        buf2 = aspp(lrelu(fuse1(pair2)))
        off2 = conv_off(buf2)
        dist = lrelu(dcn(fused[:, 1:].reshape(b * n, h, w, c), off2))
        fuse3 = conv(c, 1, dtype=dt, name="conv_f3")
        out_sv = fuse3(
            jnp.concatenate([sv.reshape(b * n, h, w, c), dist], -1)
        ).reshape(b, n, h, w, c)
        out_cv = fuse3(jnp.concatenate([cv, fused[:, 0]], -1))
        return out_sv, out_cv


@register_model("LF_DFnet")
class LFDFnet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 32)
        n25 = a * a
        cv_idx = (n25 - 1) // 2

        up_in = x.transpose(0, 3, 1, 2)
        up = interpolate(up_in, s, method="bicubic").transpose(0, 2, 3, 1)

        v = sai_to_views(x[..., 0], a)
        b, _, _, h, w = v.shape
        views = v.reshape(b, n25, h, w)[..., None].astype(dt)
        cv = views[:, cv_idx, ..., 0][..., None]
        sv = jnp.concatenate([views[:, :cv_idx], views[:, cv_idx + 1 :]], 1)

        fe = _FeaExtractD(c, dt, name="FeaExtract")
        f_cv0 = fe(cv)
        f_sv0 = fe(sv.reshape(b * (n25 - 1), h, w, 1)).reshape(b, n25 - 1, h, w, c)

        svs, cvs = [f_sv0], [f_cv0]
        f_sv, f_cv = f_sv0, f_cv0
        for i in range(3):
            f_sv, f_cv = _ADAMD(c, a, dt, name=f"ADAM_{i+1}")(f_sv, f_cv)
            svs.append(f_sv)
            cvs.append(f_cv)

        cat_sv = jnp.concatenate(svs, -1)  # [B, N-1, h, w, 4C]
        cat_cv = jnp.concatenate(cvs, -1)[:, None]  # [B, 1, h, w, 4C]

        recon = [
            _IMDB(4 * c, dt, name=f"imdb_{i}") for i in range(self.cfg.mk("n_blocks", 4))
        ]
        # reconstruction + upsample head shared between sv and cv paths
        # (DFnet.py:46-51 reuses self.Reconstruct/self.UpSample for both)
        up_conv1 = conv(c * s * s, 1, use_bias=False, dtype=dt, name="up1")
        up_conv2 = conv(1, 1, use_bias=False, dtype=dt, name="up2")

        def head(t):
            for blk in recon:
                t = blk(t)
            bt, nt = t.shape[:2]
            y = up_conv1(t.reshape(bt * nt, h, w, 4 * c))
            y = pixel_shuffle(y, s)
            return up_conv2(y).reshape(bt, nt, h * s, w * s)

        out_sv = head(cat_sv)
        out_cv = head(cat_cv)

        grid = jnp.concatenate(
            [out_sv[:, :cv_idx], out_cv, out_sv[:, cv_idx:]], axis=1
        ).reshape(b, a, a, h * s, w * s)
        return views_to_sai(grid, a)[..., None].astype(jnp.float32) + up
