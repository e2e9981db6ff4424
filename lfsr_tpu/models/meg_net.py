"""MEG-Net — multi-granularity 2D/3D epipolar-geometry branches.

Re-design of the reference MEG_Net (MEG_Net.py:21-185): four weight-shared
3-D conv branches process view stacks along the horizontal rows, vertical
columns, 45-degree anti-diagonals and 135-degree diagonals of the angular
grid (stack depth = views in the line); their features are concatenated
and refined by 4 alternating spatial (over h,w per view) / angular (over
the AxA grid per pixel) conv+PReLU blocks; reconstruction is a per-view
transposed conv (k = s+2, stride s), with a transposed-conv residual of
the raw views (:163-166).

The reference loops rows/columns/diagonals in Python (:100-160); here rows
and columns batch into one 3-D conv call each, and diagonals are grouped
by length so each distinct stack depth compiles once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


def _prelu(x, p):
    return jnp.where(x >= 0, x, p * x)


class _PReLU(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return _prelu(x, p.astype(x.dtype))


def _conv3d(feats, kernel=(3, 3, 3), dtype=None, name=None):
    pad = [((k - 1) // 2,) * 2 for k in kernel]
    return nn.Conv(feats, kernel_size=kernel, padding=pad, use_bias=True,
                   dtype=dtype, name=name)


class _DirBranch(nn.Module):
    """First conv + 4 pre-act residual 3-D conv blocks + global skip
    (MEG_Net.py:41-45, 370-396). Input [B', L, h, w, 1] (L = line length)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = _conv3d(self.feats, dtype=self.dtype, name="first")(x)
        z = y
        for i in range(4):
            r = _PReLU(self.dtype)(z)
            r = _conv3d(self.feats, dtype=self.dtype, name=f"res_{i}")(r)
            z = z + r
        return y + z  # extra global residual (MEG_Net.py:122 pattern)


def _diagonals(a: int, anti: bool):
    """Static (is, js) index lists for 45/135-degree lines
    (get_45_position / get_135_position, MEG_Net.py:493-515)."""
    lines = []
    if anti:  # 45: i decreasing, j increasing
        starts = [(i, 0) for i in range(a)] + [(a - 1, j) for j in range(1, a)]
        for i0, j0 in starts:
            seq = [(i0, j0)]
            while seq[0][0] > 0 and seq[0][1] < a - 1:
                seq.insert(0, (seq[0][0] - 1, seq[0][1] + 1))
            lines.append(seq)
    else:  # 135: i and j increasing
        starts = [(i, 0) for i in range(a)] + [(0, j) for j in range(1, a)]
        for i0, j0 in starts:
            seq = [(i0, j0)]
            while seq[-1][0] < a - 1 and seq[-1][1] < a - 1:
                seq.append((seq[-1][0] + 1, seq[-1][1] + 1))
            lines.append(seq)
    return lines


class _SAABlock(nn.Module):
    """Alternating spatial / angular conv+PReLU (forward loop,
    MEG_Net.py:170-177; ResBlock2d has no skip despite its name)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C]
        b, n, h, w, c = x.shape
        a = self.ang
        y = _conv3d(self.feats, (1, 3, 3), dtype=self.dtype)(x)
        y = _PReLU(self.dtype)(y)
        # angular pass: views become the trailing 3x3 "image"
        y = y.transpose(0, 2, 3, 1, 4).reshape(b, h * w, a, a, self.feats)
        y = _conv3d(self.feats, (1, 3, 3), dtype=self.dtype)(y)
        y = _PReLU(self.dtype)(y)
        return y.reshape(b, h, w, n, self.feats).transpose(0, 3, 1, 2, 4)


def _conv_transpose2d(x, feats, scale, dtype, name):
    """torch ConvTranspose2d(k=s+2, stride=s, padding=1) equivalent.

    flax pads with k-1-p_torch = s+1-1 = s per side (verified numerically
    against torch to 1e-6)."""
    k = scale + 2
    p = k - 1 - 1
    return nn.ConvTranspose(
        feats, kernel_size=(k, k), strides=(scale, scale),
        padding=[(p, p), (p, p)], transpose_kernel=True, use_bias=True,
        dtype=dtype, name=name,
    )(x)


@register_model("MEG_Net")
class MEGNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        f = self.cfg.mk("channels", 32)
        n = a * a

        v = sai_to_views(x[..., 0], a).astype(dt)  # [B, A, A, h, w]
        b, _, _, h, w = v.shape

        # horizontal: batch the A rows; vertical: the A columns
        hb = _DirBranch(f, dt, name="horizontal")
        rows = v.reshape(b * a, a, h, w)[..., None]
        hout = hb(rows).reshape(b, a, a, h, w, f)

        vb = _DirBranch(f, dt, name="vertical")
        cols = v.transpose(0, 2, 1, 3, 4).reshape(b * a, a, h, w)[..., None]
        vout = vb(cols).reshape(b, a, a, h, w, f).transpose(0, 2, 1, 3, 4, 5)

        # diagonals, grouped by length so each depth compiles once
        def diag_branch(name, anti):
            branch = _DirBranch(f, dt, name=name)
            out = jnp.zeros((b, a, a, h, w, f), dt)
            lines = _diagonals(a, anti)
            by_len: dict[int, list] = {}
            for seq in lines:
                by_len.setdefault(len(seq), []).append(seq)
            for L, seqs in sorted(by_len.items()):
                stacks = jnp.stack(
                    [jnp.stack([v[:, i, j] for (i, j) in seq], axis=1) for seq in seqs],
                    axis=1,
                )  # [B, n_seq, L, h, w]
                res = branch(stacks.reshape(b * len(seqs), L, h, w)[..., None])
                res = res.reshape(b, len(seqs), L, h, w, f)
                for si, seq in enumerate(seqs):
                    for li, (i, j) in enumerate(seq):
                        out = out.at[:, i, j].set(res[:, si, li])
            return out

        d45 = diag_branch("s45", anti=True)
        d135 = diag_branch("s135", anti=False)

        full = jnp.concatenate([hout, vout, d45, d135], -1)  # [B,A,A,h,w,4F]
        full = full.reshape(b, n, h, w, 4 * f)
        for i in range(self.cfg.mk("n_sab", 4)):
            full = _SAABlock(4 * f, a, dt, name=f"sa_{i}")(full)

        # reconstruction: per-view transposed conv then 3x3 to Y
        y = full.reshape(b * n, h, w, 4 * f)
        y = _conv_transpose2d(y, f, s, dt, "up")
        y = conv(1, 3, padding=1, dtype=dt)(y)

        # transposed-conv residual of the raw views (MEG_Net.py:163-166)
        res = _conv_transpose2d(v.reshape(b * n, h, w)[..., None], 1, s, dt, "up_main")
        y = (y + res).reshape(b, a, a, h * s, w * s)
        return views_to_sai(y, a)[..., None].astype(jnp.float32)
