"""LF-DET — spatial-angular separable transformer with multi-scale
angular aggregation.

Re-design of the reference LF_DET (LF_DET.py:17-330): per-view conv stem;
4 MixTransformerBlocks, each = 2 cascaded spatial transformer blocks over
per-view pixel tokens (keys/values from a 2x-strided conv reduction,
:155-195) followed by three parallel angular transformer branches over
MacPI windows of size M*A for M=1,2,3 (stride = window; edges covered by
extra windows and averaged over overlaps, :236-305) fused by a softmax
spatial-attention over the three branches; hierarchical MLA aggregation
(top-down additive fusion, :311-358) and pixel-shuffle reconstruction
with a per-view bicubic residual.

DropPath (stochastic depth 0..0.1) regularizes residual branches during
training; evaluation is deterministic.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai, views_to_macpi, macpi_to_views
from lfsr_tpu.ops.resize import interpolate


class _DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(
            self.rate, broadcast_dims=tuple(range(1, x.ndim)),
            deterministic=not train,
        )(x)


class _Attention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, side: int):
        # x: [B', N, C]; side = sqrt(N) for the sr reduction
        b, n, c = x.shape
        dt = self.dtype
        q = nn.Dense(c, use_bias=True, dtype=dt)(x)
        if self.sr_ratio > 1:
            grid = x.reshape(b, side, side, c)
            red = conv(c, self.sr_ratio, stride=self.sr_ratio, dtype=dt)(grid)
            red = nn.LayerNorm(dtype=dt)(red.reshape(b, -1, c))
            kv_src = red
        else:
            kv_src = x
        kv = nn.Dense(2 * c, use_bias=True, dtype=dt)(kv_src)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = c // self.heads
        spl = lambda a: a.reshape(b, -1, self.heads, hd)
        o = nn.dot_product_attention(spl(q), spl(k), spl(v))
        return nn.Dense(c, use_bias=True, dtype=dt)(o.reshape(b, n, c))


class _Mlp(nn.Module):
    dim: int
    ratio: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, side: int):
        b, n, c = x.shape
        h = self.dim * self.ratio
        y = nn.Dense(h, dtype=self.dtype)(x)
        g = y.reshape(b, side, side, h)
        g = conv(h, 3, padding=1, groups=h, use_bias=True, dtype=self.dtype)(g)
        y = nn.gelu(g.reshape(b, n, h))
        return nn.Dense(c, dtype=self.dtype)(y)


class _Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int
    sr_ratio: int
    drop_path: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, side: int, train: bool = False):
        dp = _DropPath(self.drop_path)
        x = x + dp(_Attention(self.dim, self.heads, self.sr_ratio, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), side), train)
        x = x + dp(_Mlp(self.dim, self.mlp_ratio, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), side), train)
        return x


def _window_starts(extent: int, ws: int):
    starts = list(range(0, extent - ws + 1, ws))
    if starts[-1] + ws < extent:
        starts.append(extent - ws)
    return starts


class _AngularWindows(nn.Module):
    """One angular branch: transformer over ws x ws MacPI windows with
    edge coverage and overlap averaging (LF_DET.py:236-305)."""

    dim: int
    heads: int
    mlp_ratio: int
    ws: int
    drop_path: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, macpi, train: bool = False):
        b, H, W, c = macpi.shape
        ws = self.ws
        blk = _Block(self.dim, self.heads, self.mlp_ratio, 1, self.drop_path, self.dtype)

        if H % ws == 0 and W % ws == 0:
            # Divisible extents (every production SAI geometry): the
            # stride-ws starts tile the plane exactly, so the gather is a
            # reshape and the overlap-average is the identity. The slice/
            # scatter loop below emits O((H/ws)^2) HLO ops per branch —
            # 1024 slices + 2048 scatter-adds at SAI-160 ws=5, which blew
            # XLA compile time past 20 min for the whole model.
            wins = macpi.reshape(b, H // ws, ws, W // ws, ws, c)
            wins = wins.transpose(0, 1, 3, 2, 4, 5)
            nw = (H // ws) * (W // ws)
            toks = wins.reshape(b * nw, ws * ws, c)
            toks = blk(toks, ws, train)
            wins = toks.reshape(b, H // ws, W // ws, ws, ws, c)
            return wins.transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)

        sh = _window_starts(H, ws)
        sw = _window_starts(W, ws)
        wins = jnp.stack(
            [macpi[:, i : i + ws, j : j + ws] for i in sh for j in sw], axis=1
        )  # [B, nW, ws, ws, C]
        nw = wins.shape[1]
        toks = wins.reshape(b * nw, ws * ws, c)
        toks = blk(toks, ws, train)
        wins = toks.reshape(b, nw, ws, ws, c)

        out = jnp.zeros((b, H, W, c), jnp.float32)
        cnt = jnp.zeros((1, H, W, 1), jnp.float32)
        k = 0
        for i in sh:
            for j in sw:
                out = out.at[:, i : i + ws, j : j + ws].add(
                    wins[:, k].astype(jnp.float32)
                )
                cnt = cnt.at[:, i : i + ws, j : j + ws].add(1.0)
                k += 1
        return (out / cnt).astype(macpi.dtype)


class _MixBlock(nn.Module):
    dim: int
    ang: int
    drop_paths: tuple
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, views, train: bool = False):
        # views: [B, U, V, h, w, C]
        b, u, v, h, w, c = views.shape
        a, dt = self.ang, self.dtype
        toks = views.reshape(b * u * v, h * w, c)
        for i in range(2):  # spa_trans_num
            toks = _Block(self.dim, 4, 4, 2, self.drop_paths[i], dt)(toks, h, train)
        views = toks.reshape(b, u, v, h, w, c)

        macpi = views_to_macpi(views.transpose(0, 5, 1, 2, 3, 4))  # [B,C,hA,wA]
        macpi = macpi.transpose(0, 2, 3, 1)
        branches = [
            _AngularWindows(self.dim, 4, 4, (m + 1) * a, self.drop_paths[-1], dt)(
                macpi, train
            )
            for m in range(3)
        ]
        attn = conv(3, 1, use_bias=True, dtype=dt)(jnp.concatenate(branches, -1))
        attn = nn.softmax(attn, axis=-1)
        fused = sum(attn[..., m : m + 1] * branches[m] for m in range(3))
        out = macpi_to_views(fused.transpose(0, 3, 1, 2), a)  # [B,C,U,V,h,w]
        return out.transpose(0, 2, 3, 4, 5, 1)


@register_model("LF_DET")
class LFDET(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 64)
        depth = self.cfg.mk("depth", 4)

        v = sai_to_views(x[..., 0], a)
        b, u, vv, h, w = v.shape
        vu = interpolate(v.reshape(b * u * vv, 1, h, w), s, method="bicubic")
        up = views_to_sai(vu.reshape(b, u, vv, h * s, w * s))[..., None]

        flat = v.reshape(b * u * vv, h, w, 1).astype(dt)
        y0 = conv(c, 3, padding=1, use_bias=False, dtype=dt)(flat)
        y = y0
        for _ in range(3):
            y = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(y))
        feat = (y + y0).reshape(b, u, vv, h, w, c)

        total = depth * 2
        dpr = [0.1 * i / max(1, total - 1) for i in range(total)]
        hier = []
        for i in range(depth):
            feat = _MixBlock(c, a, tuple(dpr[2 * i : 2 * i + 2]), dt)(feat, train)
            hier.append(feat)

        # MLA top-down aggregation (LF_DET.py:340-358)
        fused = []
        acc = jnp.zeros_like(hier[0])
        for f in reversed(hier):
            acc = acc + f
            g = acc.reshape(b * u * vv, h, w, c)
            g = lrelu(conv(c, 3, padding=1, use_bias=False, dtype=dt)(g))
            g = lrelu(conv(c // 2, 3, padding=1, use_bias=False, dtype=dt)(g))
            g = lrelu(conv(c // 2, 3, padding=1, use_bias=False, dtype=dt)(g))
            fused.append(g)
        agg = jnp.concatenate(list(reversed(fused)), -1)  # [B', h, w, 2C]

        y = conv(c * s * s, 1, use_bias=False, dtype=dt)(agg)
        y = lrelu(pixel_shuffle(y, s))  # LeakyReLU(0.1), LF_DET.py:68-73
        y = conv(1, 3, padding=1, use_bias=False, dtype=dt)(y)
        out = views_to_sai(y.reshape(b, u, vv, h * s, w * s, 1)[..., 0], a)[..., None]
        return out.astype(jnp.float32) + up
