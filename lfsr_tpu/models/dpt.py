"""DPT — detail-preserving transformer with content + gradient branches.

Re-design of the reference DPT (DPT.py:7-667): a content branch and a
gradient branch (input = Sobel-like gradient magnitude, :227-246) each run
FeaExtract -> ADAM center-view alignment (:247-292) -> two rounds of
row/column SALSA attention; the FusionTransformer cross-attends content
rows/columns against gradient features (:314-344); 5 IMDB blocks (:584-625)
refine the 3x36-channel concatenation and a per-view pixel-shuffle head
adds the bicubic residual.

SALSA (:34-126) is non-local attention whose tokens are 7x7 stride-4
convolutional patches of all 5 views in a row/column: here tokenization is
``lax.conv_general_dilated_patches`` and de-tokenization (overlap-averaged
fold) is a conv_transpose with a fixed one-hot kernel — one XLA op each,
fully batched, instead of the reference's per-batch-item Python loop.

Not replicated: the reference's Get_gradient pads the 3x3 kernel with 2
(:240-242), silently growing the map by 2px and misaligning the view grid;
here padding is 1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai
from lfsr_tpu.ops.resize import interpolate


class _RBD(nn.Module):
    """DPT's residual block — bias-free convs (DPT.py:570-581), unlike
    LF_IINet's RB."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = lrelu(conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(x))
        y = conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(y)
        return x + y


class _ResASPPD(nn.Module):
    """DPT's ResASPP: 1/2/4-dilated branches fused by a 3x3 conv
    (DPT.py:627-637 — unlike LF_IINet's 1x1 fuse)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        outs = [
            lrelu(conv(self.feats, 3, padding=d, dilation=d, use_bias=False,
                       dtype=self.dtype)(x))
            for d in (1, 2, 4)
        ]
        y = conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(
            jnp.concatenate(outs, -1)
        )
        return x + y


class _FeaExtractD(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = conv(self.feats, 1, use_bias=False, dtype=self.dtype)(x)
        y = _ResASPPD(self.feats, self.dtype)(y)
        y = _RBD(self.feats, self.dtype)(y)
        y = _ResASPPD(self.feats, self.dtype)(y)
        y = _RBD(self.feats, self.dtype)(y)
        return y


@functools.lru_cache(maxsize=8)
def _fold_kernel(k: int, c: int) -> np.ndarray:
    """One-hot conv_transpose kernel scattering (c*k*k)-channel tokens back
    to k x k x c patches; channel order (c, ki, kj) matches
    conv_general_dilated_patches / torch unfold.

    Spatially flipped because lax.conv_transpose convolves with the kernel
    as given (no flip): entry (ki, kj) of a token at block l must land at
    l*stride + ki, which the fractionally-strided convolution reads from
    kernel position (k-1-ki) (verified against torch F.fold)."""
    K = np.zeros((k, k, c * k * k, c), np.float32)
    for ki in range(k):
        for kj in range(k):
            for cc in range(c):
                K[k - 1 - ki, k - 1 - kj, cc * k * k + ki * k + kj, cc] = 1.0
    return K


def _same_pads(size: int, k: int, s: int):
    oh = -(-size // s)
    total = max((oh - 1) * s + k - size, 0)
    return oh, (total // 2, total - total // 2)


class _SALSA(nn.Module):
    """Patch-token non-local attention over a 5-view line (DPT.py:34-126).

    ``cross=True`` gives CrossAttentionSALSA: queries from the content
    features, keys/values from the gradient features (:129-226)."""

    in_channels: int
    cross: bool = False
    inter: int = 16
    ksize: int = 7
    stride: int = 4
    scale: float = 10.0
    dtype: jnp.dtype = jnp.float32
    compat_fold_pad: bool = False

    @nn.compact
    def __call__(self, x, g=None):
        # x (and g): [B, n, h, w, C]
        b, n, h, w, cin = x.shape
        dt, ci, k, s = self.dtype, self.inter, self.ksize, self.stride
        src = x if g is None else g

        # conv33 exists (unused when add_SE is off) in the reference and is
        # part of its checkpoint format (DPT.py:49) — allocated for parity.
        _ = conv(cin, 1, dtype=dt, name="conv33")(
            jnp.zeros((1, 1, 1, 2 * cin), dt)
        )
        q_f = conv(ci, 1, dtype=dt, name="g")(x.reshape(b * n, h, w, cin))
        v_f = conv(ci, 1, dtype=dt, name="theta")(src.reshape(b * n, h, w, cin))
        k_f = conv(ci, 1, dtype=dt, name="phi")(src.reshape(b * n, h, w, cin))

        oh, (pl, pr) = _same_pads(h, k, s)
        ow, (ql, qr) = _same_pads(w, k, s)

        def patches(f):
            p = jax.lax.conv_general_dilated_patches(
                f.transpose(0, 3, 1, 2), (k, k), (s, s), ((pl, pr), (ql, qr))
            )  # [B*n, ci*k*k, oh, ow]
            return p.reshape(b, n, ci * k * k, oh * ow).transpose(0, 1, 3, 2).reshape(
                b, n * oh * ow, ci * k * k
            )

        q = patches(q_f)
        kk = patches(k_f)
        v = patches(v_f)

        att = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32), kk.astype(jnp.float32))
        att = jax.nn.softmax(att * self.scale, axis=-1)
        z = jnp.einsum("bts,bsd->btd", att, v.astype(jnp.float32)).astype(dt)

        # fold with overlap averaging (one conv_transpose + a count map)
        z = z.reshape(b * n, oh, ow, ci * k * k)
        Kf = jnp.asarray(_fold_kernel(k, ci), z.dtype)
        fold = lambda t: jax.lax.conv_transpose(
            t, Kf, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        if self.compat_fold_pad:
            # reference de-tokenization bug-compat: F.fold uses the
            # symmetric stride-1 'same' padding ((k-1)//2) although tokens
            # were extracted with the asymmetric stride-s padding, and its
            # coverage mask is unfolded from a zero-padded ones image
            # (DPT.py:104-115)
            fp = (k - 1) // 2
            zi = fold(z)[:, fp : fp + h, fp : fp + w]
            ones = jnp.ones((1, 1, h, w), jnp.float32)
            t1 = jax.lax.conv_general_dilated_patches(
                ones, (k, k), (s, s), ((fp, fp), (fp, fp))
            )  # [1, k*k, oh, ow]
            t1 = t1.transpose(0, 2, 3, 1)
            K1 = jnp.asarray(_fold_kernel(k, 1))
            cnt = jax.lax.conv_transpose(
                t1, K1, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )[:, fp : fp + h, fp : fp + w]
            zi = zi / cnt.astype(zi.dtype)
        else:
            zi = fold(z)[:, pl : pl + h, ql : ql + w]
            cnt = fold(jnp.ones_like(z))[:, pl : pl + h, ql : ql + w]
            zi = zi / cnt

        y = conv(cin, 1, dtype=dt, name="W")(zi).reshape(b, n, h, w, cin)
        return x + y  # SALSA's own residual (DPT.py:118)


class _SalsaWrap(nn.Module):
    in_channels: int
    cross: bool = False
    dtype: jnp.dtype = jnp.float32
    compat_fold_pad: bool = False

    @nn.compact
    def __call__(self, x, g=None):
        att = _SALSA(self.in_channels, self.cross, dtype=self.dtype,
                     compat_fold_pad=self.compat_fold_pad, name="attention")
        # SALSA itself ends with y = b_one + W(zi); the salsa wrapper adds
        # another residual: x + attention(x) (DPT.py:294-311)
        return x + att(x, g)


class _ADAM(nn.Module):
    """Center-view alignment module (DPT.py:247-292)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, 25, h, w, C]
        b, n25, h, w, c = x.shape
        a, dt = self.ang, self.dtype
        cv_idx = n25 // 2
        x_cv = x[:, cv_idx]
        x_sv = jnp.concatenate([x[:, :cv_idx], x[:, cv_idx + 1 :]], axis=1)
        n = n25 - 1

        fuse1 = conv(c, 1, dtype=dt, name="conv_1")
        aspp = _ResASPPD(c, dt)
        pair = jnp.concatenate(
            [x_sv, jnp.broadcast_to(x_cv[:, None], x_sv.shape)], -1
        ).reshape(b * n, h, w, 2 * c)
        aligned = aspp(lrelu(fuse1(pair))).reshape(b, n, h, w, c)

        collect = jnp.concatenate(
            [aligned.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c), x_cv], -1
        )
        fused = conv(n25 * c, 1, dtype=dt, name="conv_f1")(collect)
        fused = fused.reshape(b, h, w, n25, c).transpose(0, 3, 1, 2, 4)

        pair2 = jnp.concatenate([fused[:, 1:], x_sv], -1).reshape(b * n, h, w, 2 * c)
        buf = aspp(lrelu(fuse1(pair2))).reshape(b, n, h, w, c)
        fuse3 = conv(c, 1, dtype=dt, name="conv_f3")  # shared sv/cv (DPT.py:255)
        out_sv = fuse3(
            jnp.concatenate([x_sv, buf], -1).reshape(b * n, h, w, 2 * c)
        ).reshape(b, n, h, w, c)
        out_cv = fuse3(jnp.concatenate([x_cv, fused[:, 0]], -1))
        return jnp.concatenate(
            [out_sv[:, :cv_idx], out_cv[:, None], out_sv[:, cv_idx:]], axis=1
        )


class _IMDB(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C]
        b, n, h, w, c = x.shape
        dt = self.dtype
        y = x.reshape(b * n, h, w, c)
        y = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(y))
        keep = []
        for i in range(3):
            keep.append(y[..., : c // 4])
            y = lrelu(
                conv(c if i < 2 else c // 4, 3, padding=1, use_bias=False, dtype=dt)(
                    y[..., c // 4 :]
                )
            )
        keep.append(y)
        y = jnp.concatenate(keep, -1)
        y = lrelu(conv(c, 1, use_bias=False, dtype=dt)(y))
        return y.reshape(b, n, h, w, c) + x


class _RowColSalsa(nn.Module):
    """One row pass + one column pass of (cross-)SALSA over the 5x5 grid."""

    feats: int
    ang: int
    cross: bool
    dtype: jnp.dtype
    compat_fold_pad: bool = False

    @nn.compact
    def __call__(self, x, g=None):
        # x: [B, 25, h, w, C] in row-major view order
        b, n, h, w, c = x.shape
        a = self.ang
        row_att = _SalsaWrap(c, self.cross, self.dtype, self.compat_fold_pad, name="row")
        col_att = _SalsaWrap(c, self.cross, self.dtype, self.compat_fold_pad, name="col")

        xr = x.reshape(b, a, a, h, w, c).reshape(b * a, a, h, w, c)
        gr = None if g is None else g.reshape(b * a, a, h, w, c)
        xr = row_att(xr, gr).reshape(b, a, a, h, w, c)

        xc = xr.transpose(0, 2, 1, 3, 4, 5).reshape(b * a, a, h, w, c)
        gc = (
            None
            if g is None
            else g.reshape(b, a, a, h, w, c).transpose(0, 2, 1, 3, 4, 5).reshape(b * a, a, h, w, c)
        )
        xc = col_att(xc, gc).reshape(b, a, a, h, w, c)
        # Col_T maps column-major back to row-major (DPT.py:473-481)
        return xc.transpose(0, 2, 1, 3, 4, 5).reshape(b, n, h, w, c)


class _Branch(nn.Module):
    """Content / gradient branch (DPT.py:347-470)."""

    feats: int
    ang: int
    dtype: jnp.dtype
    compat_fold_pad: bool = False

    @nn.compact
    def __call__(self, views):
        # views: [B, 25, h, w, 1]
        b, n, h, w, _ = views.shape
        c, dt = self.feats, self.dtype
        f0 = _FeaExtractD(c, dt)(views.reshape(b * n, h, w, 1)).reshape(b, n, h, w, c)
        f1 = _ADAM(c, self.ang, dt)(f0)
        f1 = _RowColSalsa(c, self.ang, False, dt, self.compat_fold_pad, name="round1")(f1)
        f2 = _RowColSalsa(c, self.ang, False, dt, self.compat_fold_pad, name="round2")(f1)
        return jnp.concatenate([f0, f1, f2], -1)  # [B, 25, h, w, 3C]


@register_model("DPT")
class DPT(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 36)
        n = a * a
        # reference-replication switches (weight-transfer parity testing):
        # grad pad=2 grows the map 2px and truncation-splits it (DPT.py:240-246);
        # fold pad uses the stride-1 symmetric padding (DPT.py:104-115)
        compat_grad = self.cfg.mk("compat_grad_pad2", False)
        compat_fold = self.cfg.mk("compat_fold_pad", False)

        up_in = x.transpose(0, 3, 1, 2)
        up = interpolate(up_in, s, method="bicubic").transpose(0, 2, 3, 1)

        # gradient magnitude (padding 1; the reference's off-by-two pad is
        # reproduced only under compat_grad_pad2)
        gp = 2 if compat_grad else 1
        kv = jnp.asarray([[0, -1, 0], [0, 0, 0], [0, 1, 0]], jnp.float32).reshape(3, 3, 1, 1)
        kh = jnp.asarray([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], jnp.float32).reshape(3, 3, 1, 1)
        e = lambda kern: jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), [(gp, gp), (gp, gp)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        grad = jnp.sqrt(e(kv) ** 2 + e(kh) ** 2 + 1e-6)

        v = sai_to_views(x[..., 0], a)
        b, _, _, h, w = v.shape
        if compat_grad:
            # reference LFsplit truncates the (H+2, W+2) map at h2=(H+2)//a
            gm = grad[..., 0]
            h2, w2 = gm.shape[1] // a, gm.shape[2] // a
            assert (h2, w2) == (h, w), "compat_grad_pad2 needs (H+2)//a == H//a"
            gv = jnp.stack(
                [
                    jnp.stack(
                        [gm[:, u * h2 : (u + 1) * h2, vv * w2 : (vv + 1) * w2]
                         for vv in range(a)], 1
                    )
                    for u in range(a)
                ],
                1,
            )
        else:
            gv = sai_to_views(grad[..., 0], a)
        views = v.reshape(b, n, h, w)[..., None].astype(dt)
        gviews = gv.reshape(b, n, h, w)[..., None].astype(dt)

        sfeat = _Branch(c, a, dt, compat_fold, name="srbranch")(views)
        gfeat = _Branch(c, a, dt, compat_fold, name="gbranch")(gviews)

        fused = _RowColSalsa(3 * c, a, True, dt, compat_fold, name="fuse")(sfeat, gfeat)
        for i in range(self.cfg.mk("n_blocks", 5)):
            fused = _IMDB(3 * c, dt, name=f"imdb_{i}")(fused)

        y = fused.reshape(b * n, h, w, 3 * c)
        y = conv(c * s * s, 1, use_bias=False, dtype=dt)(y)
        y = pixel_shuffle(y, s)
        y = conv(1, 1, use_bias=False, dtype=dt)(y)
        out = views_to_sai(y.reshape(b, a, a, h * s, w * s, 1)[..., 0], a)[..., None]
        return out.astype(jnp.float32) + up
