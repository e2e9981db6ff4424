"""resLF — per-view star-shaped EPI-direction residual networks.

Re-design of the reference resLF (resLF.py:18-212). Each target view is
super-resolved from the 4 EPI-direction view stacks (0/90/45/135 degrees)
through the center of a surrounding sub-grid; which sub-net runs depends
on the view's angular position (resLF.py:59-104):
- center view          -> r=5 net on the full grid,
- ring-1 views (8)     -> r=3 net on the in-bounds 3x3 neighborhood,
- side views (12)      -> dedicated r=3 net on the zero-padded 3x3,
- corner views (4)     -> dedicated r=3 net on the zero-padded 3x3.

The reference loops over all 25 views in Python; here views of the same
category are gathered (static indices) and batched through their shared
sub-net in one call.

The reference allocates nets for r=7 and r=9 unconditionally (resLF.py:
24-29), which is why its published count is 8.646M; with
``allocate_all_subnets`` (default True for parity) we do too.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


class _ResBlock(nn.Module):
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = nn.relu(conv(self.feats, 3, padding=1, dtype=self.dtype)(x))
        y = conv(self.feats, 3, padding=1, dtype=self.dtype)(y)
        return x + y


class _BasicNet(nn.Module):
    """One sub-net (basic_Net, resLF.py:112-194): 4 direction stacks ->
    shared 4-resblock trunk -> merged 4-resblock body -> central residual
    -> pixel-shuffle tail."""

    radius: int
    scale: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, grid):
        # grid: [B, r, r, h, w] (zero-padded where out of bounds)
        r, dt = self.radius, self.dtype
        c = 32
        b, _, _, h, w = grid.shape
        mid = r // 2
        central = grid[:, mid, mid][..., None].astype(dt)  # [B, h, w, 1]

        idx = np.arange(r)
        d0 = grid[:, mid, :]                      # [B, r, h, w] 0 deg
        d90 = grid[:, :, mid]                     # 90 deg
        d45 = grid[:, idx, idx[::-1]]             # 45 deg
        d135 = grid[:, idx, idx]                  # 135 deg

        head = conv(c, 3, padding=1, use_bias=False, dtype=dt, name="head")
        trunk = [_ResBlock(c, dt) for _ in range(4)]

        def run_dir(d):
            y = head(d.transpose(0, 2, 3, 1).astype(dt))
            for blk in trunk:
                y = blk(y)
            return y

        merged = jnp.concatenate([run_dir(d) for d in (d0, d90, d45, d135)], -1)
        y = merged
        for _ in range(4):
            y = _ResBlock(4 * c, dt)(y)
        y = conv(c, 3, padding=1, use_bias=False, dtype=dt)(y)
        y = y + conv(c, 3, padding=1, use_bias=False, dtype=dt, name="central_head")(central)

        y = conv(c * self.scale**2, 3, padding=1, use_bias=False, dtype=dt)(y)
        y = pixel_shuffle(y, self.scale)
        return conv(1, 3, padding=1, use_bias=False, dtype=dt)(y)[..., 0]


def _category_views(ang: int):
    """Static view-index categories (resLF.py:59-104 logic)."""
    center, ring1, side, corner = [], [], [], []
    for i in range(ang):
        for j in range(ang):
            d = np.hypot(i - ang // 2, j - ang // 2)
            if d >= ang // 2:
                (corner if (i in (0, ang - 1) and j in (0, ang - 1)) else side).append((i, j))
            elif d == 0:
                center.append((i, j))
            else:
                ring1.append((i, j))
    return center, ring1, side, corner


@register_model("resLF")
class ResLF(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        assert a == 5, "resLF wiring implemented for 5x5 (reference default)"

        v = sai_to_views(x[..., 0], a)  # [B, A, A, h, w]
        b, _, _, h, w = v.shape
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))  # zero pad

        net5 = _BasicNet(5, s, dt, name="net_5x5")
        net3 = _BasicNet(3, s, dt, name="net_3x3")
        net_side = _BasicNet(3, s, dt, name="net_side")
        net_corner = _BasicNet(3, s, dt, name="net_corner")

        center, ring1, side, corner = _category_views(a)

        def gather3(pairs, padded: bool):
            src = vp if padded else v
            off = 1 if padded else 0
            grids = [
                src[:, i + off - 1 : i + off + 2, j + off - 1 : j + off + 2]
                for (i, j) in pairs
            ]
            return jnp.concatenate(grids, axis=0)  # [K*B, 3, 3, h, w]

        outs = {}
        outs[center[0]] = net5(v)
        r1 = net3(gather3(ring1, padded=False))
        for k, ij in enumerate(ring1):
            outs[ij] = r1[k * b : (k + 1) * b]
        sd = net_side(gather3(side, padded=True))
        for k, ij in enumerate(side):
            outs[ij] = sd[k * b : (k + 1) * b]
        cr = net_corner(gather3(corner, padded=True))
        for k, ij in enumerate(corner):
            outs[ij] = cr[k * b : (k + 1) * b]

        if self.cfg.mk("allocate_all_subnets", True):
            # reference allocates r=7/r=9 nets unconditionally (resLF.py:28-29)
            dummy = jnp.zeros((1, 7, 7, 4, 4), dt)
            _ = _BasicNet(7, s, dt, name="net_7x7")(dummy)
            dummy9 = jnp.zeros((1, 9, 9, 4, 4), dt)
            _ = _BasicNet(9, s, dt, name="net_9x9")(dummy9)

        grid = jnp.stack(
            [jnp.stack([outs[(i, j)] for j in range(a)], 1) for i in range(a)], 1
        )  # [B, A, A, h*s, w*s]
        return views_to_sai(grid, a)[..., None].astype(jnp.float32)
