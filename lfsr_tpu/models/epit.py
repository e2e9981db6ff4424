"""EPIT — non-local spatial-angular correlation via EPI-axis attention.

Re-design of the reference EPIT (EPIT.py:16-169, BASELINE config #4):
per-view conv stem, five alternating filters that attend over the two EPI
planes — first over (u, h) tokens batched across (v, w), then over (v, w)
tokens batched across (u, h) — each followed by a shared 3-layer per-view
conv, and a pixel-shuffle head over a bicubic global residual.

The banded locality mask (full range across the angular axis, 11-wide
window along the spatial axis; EPIT.py:93-108 with mask_field [2A, 11] set
at :147) is static for a given patch size, so it is precomputed host-side
with numpy instead of rebuilt per forward as the reference does.

Deliberately NOT replicated: the reference's get_loss indexes out['SR']
while forward returns a tensor (EPIT.py:178 vs :71) — a crash in training;
here the loss is plain L1 on the output tensor.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu02
from lfsr_tpu.models.common import pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.ops import pallas_masked_attention as masked_attn
from lfsr_tpu.ops.layout import sai_to_views, views_to_sai


@functools.lru_cache(maxsize=32)
def _band_mask(rows: int, cols: int, k_r: int, k_c: int) -> np.ndarray:
    """Additive attention mask over a (rows, cols) token grid: token (i,j)
    may attend to (k,l) iff k in [i-k_r//2, i+ceil(k_r/2)) and l in
    [j-k_c//2, j+ceil(k_c/2)) — EPIT.py gen_mask semantics."""
    r = np.arange(rows)
    c = np.arange(cols)
    ok_r = (r[None, :] - r[:, None] >= -(k_r // 2)) & (
        r[None, :] - r[:, None] < k_r - k_r // 2
    )
    ok_c = (c[None, :] - c[:, None] >= -(k_c // 2)) & (
        c[None, :] - c[:, None] < k_c - k_c // 2
    )
    ok = ok_r[:, None, :, None] & ok_c[None, :, None, :]
    ok = ok.reshape(rows * cols, rows * cols)
    return np.where(ok, 0.0, -np.inf).astype(np.float32)


class _EPITransformer(nn.Module):
    """Pre-norm MHA over EPI tokens + FFN (BasicTrans, EPIT.py:74-128).

    Torch-MHA parity details: q/k projections read the LayerNormed tokens
    but the value projection reads the *raw* tokens (EPIT.py:118-122), and
    no projection carries a bias.
    """

    channels: int
    spa_dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tok, mask):
        # tok: [B', L, C]; mask: [L, L] additive
        dt = self.dtype
        d = self.spa_dim
        t = nn.Dense(d, use_bias=False, dtype=dt)(tok)
        tn = nn.LayerNorm(dtype=dt)(t)
        q = nn.Dense(d, use_bias=False, dtype=dt)(tn)
        k = nn.Dense(d, use_bias=False, dtype=dt)(tn)
        v = nn.Dense(d, use_bias=False, dtype=dt)(t)

        bsz, L, _ = q.shape
        hd = d // self.heads
        if masked_attn.supported(L, d, self.heads):
            # fused VMEM-resident attention: identical math (oracle +
            # gradient tests in tests/test_pallas_masked_attention.py);
            # avoids the [B', heads, L, L] HBM score tensors that make
            # the XLA path ~5% MFU (PERF.md round-3 EPIT entry)
            attn = masked_attn.masked_mha_fused(q, k, v, mask, self.heads)
        else:
            split = lambda a: a.reshape(bsz, L, self.heads, hd)
            attn = nn.dot_product_attention(
                split(q), split(k), split(v), bias=mask[None, None, :, :]
            ).reshape(bsz, L, d)
        attn = nn.Dense(d, use_bias=False, dtype=dt)(attn)
        t = t + attn

        f = nn.LayerNorm(dtype=dt)(t)
        f = nn.Dense(2 * d, use_bias=False, dtype=dt)(f)
        f = nn.relu(f)
        f = nn.Dense(d, use_bias=False, dtype=dt)(f)
        t = t + f
        return nn.Dense(self.channels, use_bias=False, dtype=dt)(t)


class _ViewConv3(nn.Module):
    """Shared 3-layer per-view conv (the reference's (1,3,3) Conv3d stack):
    a 2-D conv applied independently to every view. The stem stack ends
    with a LeakyReLU (conv_init, EPIT.py:26-33) while the AltFilter stack
    does not (EPIT.py:139-145) — hence ``final_act``."""

    feats: int
    dtype: jnp.dtype
    final_act: bool = False

    @nn.compact
    def __call__(self, x):
        # x: [B, N, h, w, C] -> fold views into batch
        b, n, h, w, c = x.shape
        y = x.reshape(b * n, h, w, c)
        y = lrelu02(conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(y))
        y = lrelu02(conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(y))
        y = conv(self.feats, 3, padding=1, use_bias=False, dtype=self.dtype)(y)
        if self.final_act:
            y = lrelu02(y)
        return y.reshape(b, n, h, w, c)


class _AltFilter(nn.Module):
    ang: int
    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # x: [B, U, V, h, w, C]
        a = self.ang
        b, u, v, h, w, c = x.shape
        trans = _EPITransformer(self.feats, self.feats * 2, 8, self.dtype)
        cstack = _ViewConv3(self.feats, self.dtype)
        shortcut = x

        # Pass 1: attend over (u, h) tokens, batched over (b, v, w)
        mask = jnp.asarray(_band_mask(u, h, 2 * a, 11))
        t = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * v * w, u * h, c)
        t = trans(t, mask)
        x = t.reshape(b, v, w, u, h, c).transpose(0, 3, 1, 4, 2, 5)
        x = cstack(x.reshape(b, u * v, h, w, c)).reshape(b, u, v, h, w, c) + shortcut

        # Pass 2: attend over (v, w) tokens, batched over (b, u, h)
        mask = jnp.asarray(_band_mask(v, w, 2 * a, 11))
        t = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * u * h, v * w, c)
        t = trans(t, mask)
        y = t.reshape(b, u, h, v, w, c).transpose(0, 1, 3, 2, 4, 5)
        y = cstack(y.reshape(b, u * v, h, w, c)).reshape(b, u, v, h, w, c) + shortcut
        return y


@register_model("EPIT")
class EPIT(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x):
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        dt = jnp.dtype(self.cfg.compute_dtype)
        feats = self.cfg.mk("channels", 64)

        # Global residual is per-view bicubic (LF_interpolate, EPIT.py:164-169)
        # — not whole-mosaic bicubic, which would blur across view borders.
        v = sai_to_views(x[..., 0], a)  # [B, U, V, h, w]
        b, u, vv, h, w = v.shape
        from lfsr_tpu.ops.resize import interpolate as _interp

        vu = _interp(v.reshape(b * u * vv, 1, h, w), s, method="bicubic")
        up = views_to_sai(vu.reshape(b, u, vv, h * s, w * s))[..., None]

        views = v[..., None].astype(dt)  # [B,U,V,h,w,1]
        stem_in = views.reshape(b * u * vv, h, w, 1)
        y = conv(feats, 3, padding=1, use_bias=False, dtype=dt)(stem_in)
        y = y.reshape(b, u * vv, h, w, feats)
        y = _ViewConv3(feats, dt, final_act=True)(y) + y
        y = y.reshape(b, u, vv, h, w, feats)

        skip = y
        for _ in range(self.cfg.mk("n_blocks", 5)):
            y = _AltFilter(a, feats, dt)(y)
        y = y + skip

        sai = views_to_sai(y.transpose(0, 5, 1, 2, 3, 4))  # [B, C, U*h, V*w]
        sai = sai.transpose(0, 2, 3, 1)
        out = conv(feats * s * s, 1, use_bias=False, dtype=dt)(sai)
        out = pixel_shuffle(out, s)
        out = lrelu02(out)
        out = conv(1, 3, padding=1, use_bias=False, dtype=dt)(out)
        return out.astype(jnp.float32) + up
