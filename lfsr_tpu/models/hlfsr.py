"""HLFSR — high-frequency multi-branch extraction over all LF subspaces.

Re-design of the reference HLFSR (HLFSR.py:7-345): five cascaded HFEM
stages, each extracting five feature families from the MacPI tensor —
(1) MO-EPI: the four directional view lines (0/90/45/135 through the
center, HLFSR.py:318-344) through one shared head + PixelShuffle(A)
expansion; (2) intra-spatial (3x3 dilation-A); (3) inter-spatial (plain
3x3 on MacPI); (4) intra-angular (AxA stride-A) and (5) inter-angular
(2Ax2A stride-2A) with pixel-shuffle expansion — fused by a covariance
attention over the five branches (:164-193) and refined by a 15-block
dilated residual group with channel attention. Bicubic global residual,
pixel-shuffle tail on the SAI mosaic.

EPI line extraction uses the views tensor directly instead of the
reference's strided MacPI gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai, macpi_to_views


def _epi_lines(views: jnp.ndarray, a: int):
    """views [B, U, V, h, w, C] -> four [B, h, w, A*C] line stacks
    (HLFSR.py MacPI2EPI semantics; channel order = line-index major)."""
    c = a // 2
    idx = list(range(a))

    def stack(pairs):
        return jnp.concatenate([views[:, u, v] for (u, v) in pairs], axis=-1)

    d0 = stack([(c, i) for i in idx])
    d90 = stack([(i, c) for i in idx])
    d45 = stack([(i, i) for i in idx])
    d135 = stack([(i, a - 1 - i) for i in idx])
    return d0, d90, d45, d135


class _CAResBlock(nn.Module):
    feats: int
    dilation: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        d, dt = self.dilation, self.dtype
        y = nn.relu(conv(self.feats, 3, dilation=d, padding=d, dtype=dt)(x))
        y = conv(self.feats, 3, dilation=d, padding=d, dtype=dt)(y)
        ca = jnp.mean(y, axis=(1, 2), keepdims=True)
        ca = nn.relu(conv(4, 1, dtype=dt)(ca))  # reduction = feats//4 -> hidden 4
        ca = nn.sigmoid(conv(self.feats, 1, dtype=dt)(ca))
        return x + y * ca


class _AttentionFusion(nn.Module):
    """Covariance attention over the N=5 branch stack (HLFSR.py:164-193)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C]
        b, n, h, w, c = x.shape
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        beta = self.param("beta", nn.initializers.zeros, (1,))
        flat = x.reshape(b, n, -1).astype(jnp.float32)
        m = flat.shape[-1]
        centered = flat - jnp.mean(flat, axis=-1, keepdims=True)
        cov = (centered @ centered.transpose(0, 2, 1)) / (m - 1) * alpha
        norm = cov / jnp.sqrt(jnp.mean(cov**2, axis=(1, 2), keepdims=True) + 1e-5)
        attn = jnp.tanh(gamma * norm + beta)
        out = (attn @ flat).reshape(b, n, h, w, c).astype(x.dtype) + x
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


class _HFEM(nn.Module):
    feats: int
    ang: int
    n_blocks: int
    first: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, macpi):
        a, dt, c = self.ang, self.dtype, self.feats
        views = macpi_to_views(macpi.transpose(0, 3, 1, 2), a)  # [B,C,U,V,h,w]
        views = views.transpose(0, 2, 3, 4, 5, 1)  # [B,U,V,h,w,C]

        head_epi = conv(c, 3, padding=1, use_bias=False, dtype=dt, name="head_epi")
        lines = _epi_lines(views, a)
        epi = jnp.concatenate([head_epi(l) for l in lines], -1)  # [B,h,w,4C]
        epi = conv(a * a * c, 1, use_bias=False, dtype=dt)(epi)
        x_epi = pixel_shuffle(epi, a)

        s_intra = conv(c, 3, dilation=a, padding=a, use_bias=False, dtype=dt)(macpi)
        s_inter = conv(c, 3, padding=1, use_bias=False, dtype=dt)(macpi)

        a_intra = conv(c, a, stride=a, use_bias=False, dtype=dt)(macpi)
        a_intra = pixel_shuffle(
            conv(a * a * c, 1, use_bias=False, dtype=dt)(a_intra), a
        )
        a_inter = conv(c, 2 * a, stride=2 * a, use_bias=False, dtype=dt)(macpi)
        a_inter = pixel_shuffle(
            conv(4 * a * a * c, 1, use_bias=False, dtype=dt)(a_inter), 2 * a
        )

        stack = jnp.stack([x_epi, a_inter, a_intra, s_inter, s_intra], axis=1)
        fused = _AttentionFusion(dt)(stack)  # [B, H, W, 5C]
        y = conv(c, 1, use_bias=False, dtype=dt)(fused)
        z = y
        for _ in range(self.n_blocks):
            z = _CAResBlock(c, a, dt)(z)
        return conv(c, 3, dilation=a, padding=a, dtype=dt)(z) + y


@register_model("HLFSR")
class HLFSR(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg.mk("channels", 64)
        n_blocks = self.cfg.mk("n_blocks", 15)

        up = bicubic_up(x, s)
        m = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1).astype(dt)
        for i in range(self.cfg.mk("n_groups", 5)):
            m = _HFEM(c, a, n_blocks, first=(i == 0), dtype=dt, name=f"hfem_{i}")(m)
        sai = macpi_to_sai(m.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        y = sai
        for _ in range(s // 2):
            y = conv(4 * c, 3, padding=1, dtype=dt)(y)
            y = pixel_shuffle(y, 2)
        y = conv(1, 1, use_bias=False, dtype=dt)(y)
        return y.astype(jnp.float32) + up
