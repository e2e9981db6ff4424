"""LF-ATO — all-to-one view fusion.

Re-design of the reference LFSSR_ATO (LFSSR_ATO.py:17-110): shared
per-view feature extraction (5 resblocks), then for every reference view:
pair each of the A^2 views with it (2 resblocks), fuse all views into the
reference (2+3 resblocks), upsample x2(x2) and reconstruct; bilinear
global residual.

The reference loops over the 25 reference views in Python (:73-99); here
the loop is a ``lax.scan`` over the view axis with shared weights — one
compiled body, bounded memory, sequential like the original but without
25 separate kernel launches per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.cnn_baselines import _nchw, _nhwc
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai
from lfsr_tpu.ops.resize import interpolate


class _ResBlock(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = nn.relu(conv(self.feats, 3, padding=1, dtype=self.dtype)(x))
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        return x + y


class _ResStack(nn.Module):
    feats: int
    n: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n):
            x = _ResBlock(self.feats, self.dtype)(x)
        return x


class _PerRefFusion(nn.Module):
    """Everything inside the reference's per-view loop (LFSSR_ATO.py:73-99)."""

    feats: int
    scale: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, feat, ref_feat):
        # feat: [B, N, h, w, C]; ref_feat: [B, h, w, C]
        b, n, h, w, c = feat.shape
        dt = self.dtype
        pair = jnp.concatenate(
            [feat, jnp.broadcast_to(ref_feat[:, None], feat.shape)], axis=-1
        ).reshape(b * n, h, w, 2 * c)
        pair = nn.relu(conv(c, 3, padding=1, dtype=dt)(pair))
        pair = _ResStack(c, 2, dt)(pair)
        aligned = conv(c, 3, padding=1, dtype=dt)(pair).reshape(b, n, h, w, c)

        # view fusion: treat feature channels as batch, views as channels
        va = aligned.transpose(0, 4, 2, 3, 1).reshape(b * c, h, w, n)
        va = nn.relu(conv(self.feats, 3, padding=1, dtype=dt)(va))
        va = _ResStack(self.feats, 2, dt)(va)
        va = nn.relu(conv(1, 3, padding=1, dtype=dt)(va))
        fused = va.reshape(b, c, h, w).transpose(0, 2, 3, 1)

        fused = nn.relu(conv(c, 3, padding=1, dtype=dt)(fused))
        fused = _ResStack(c, 3, dt)(fused)

        y = fused
        for _ in range(self.scale // 2):
            y = conv(4 * c, 3, padding=1, dtype=dt)(y)
            y = nn.relu(pixel_shuffle(y, 2))
        y = nn.relu(conv(c // 2, 3, padding=1, dtype=dt)(y))
        return conv(1, 3, padding=1, dtype=dt)(y)[..., 0]  # [B, h*s, w*s]


@register_model("LF_ATO")
class LFATO(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 64)

        v = sai_to_views(x[..., 0], a)  # [B, A, A, h, w]
        b, _, _, h, w = v.shape
        n = a * a
        views = v.reshape(b, n, h, w)

        up = interpolate(views, s, method="bilinear")  # [B, N, h*s, w*s]

        feat = nn.relu(
            conv(c, 3, padding=1, dtype=dt)(views.reshape(b * n, h, w, 1).astype(dt))
        )
        feat = _ResStack(c, 5, dt)(feat).reshape(b, n, h, w, c)

        fusion = _PerRefFusion(c, s, dt)

        # scan the shared-weight fusion over the N reference views in
        # chunks: each scan step folds `ref_chunk` reference views into
        # the batch axis so one dispatch carries k x the work (the r5 zoo
        # MFU fix — 25 tiny sequential steps starved the MXU). Math and
        # params are identical to the per-ref loop (LFSSR_ATO.py:73-99).
        k = self.cfg.mk("ref_chunk", 5)
        if n % k:
            k = 1

        def per_chunk(module, rf):
            # rf: [B, k, h, w, C] -> fold into batch
            feat_b = jnp.broadcast_to(
                feat[:, None], (b, k, n, h, w, c)
            ).reshape(b * k, n, h, w, c)
            out = module(feat_b, rf.reshape(b * k, h, w, c))
            return out.reshape(b, k, h * s, w * s)

        outs = nn.scan(
            lambda mdl, carry, rf: (carry, per_chunk(mdl, rf)),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(fusion, None, feat.reshape(b, n // k, k, h, w, c))[1]
        outs = outs.reshape(b, n, h * s, w * s)

        out = outs.astype(jnp.float32) + up
        return views_to_sai(out.reshape(b, a, a, h * s, w * s), a)[..., None]
