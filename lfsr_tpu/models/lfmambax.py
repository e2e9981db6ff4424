"""LFMambaX — the flagship efficiency-track model (V8-class, TPU-native).

Functional re-design of the reference's MyEfficientLFNet v8.1
(MyEfficientLFNetV8.py) under the NTIRE Track-2 budget (<1M params,
<20 GFLOPs at SAI input 1x1x160x160). Four-module layout:

  IFE   multi-scale (3/5/7) conv stem                     (V8:296-327)
  SAFL  12 LF-VSSM blocks in 4/5/3 phases, window attention at 33%/75%
        depth with relative-position bias                 (V8:100-116, 461-546)
  LSFL  EPI h/v depthwise structure learning + disparity  (V8:552-608)
        + 4-stage progressive fusion over block outputs   (V8:614-649)
  HLFR  deep reconstruction head + pixel-shuffle x2x2     (V8:716-773)

TPU-first substitutions:
- the CUDA ``mamba_ssm`` selective scan becomes the associative-scan Mamba
  (lfsr_tpu.models.ssm) — log-depth parallel over the raster sequence;
- the 4-way cross-scan feeds one shared Mamba with channel groups reading
  the raster in 4 orders, built from pure reshapes/flips (V8:375-455);
- window attention is a reshape + batched dot_product_attention;
- SRACM masking lives in the trainer (one implementation instead of the
  reference's duplicated external+internal paths, SURVEY.md §2.4).

Depth-aware residual scaling (0.15..0.425) follows V8:276-293.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.config import Config
from lfsr_tpu.models.common import conv, lrelu, pixel_shuffle
from lfsr_tpu.models.registry import register_model
from lfsr_tpu.models.cnn_baselines import bicubic_up
from lfsr_tpu.models.ssm import Mamba
from lfsr_tpu.models import losses
from lfsr_tpu.ops.layout import sai_to_macpi, macpi_to_sai


def _dw(feats, kernel=3, dilation=1, name=None, dtype=None):
    pad = dilation * (kernel - 1) // 2
    return conv(
        feats, kernel, dilation=dilation, padding=pad, groups=feats,
        use_bias=False, name=name, dtype=dtype,
    )


# MultiScaleLocal's depthwise 3x3 as shift-mul-adds instead of a grouped
# conv: identical math and params, but pure elementwise ops that XLA fuses
# with the surrounding matmuls (in-context A/B at mb=2: 19.9 -> 19.1 ms;
# XLA's grouped-conv lowering is latency-bound at small batch).
_DW_SHIFT = True


def _dw_apply(x, feats, dt, kernel=3, dilation=1, name=None):
    """Depthwise KxK conv applied as shift-mul-adds when _DW_SHIFT is on
    (same params/math as the grouped conv; see _DW_SHIFT note)."""
    m = _dw(feats, kernel, dilation, name=name, dtype=dt)
    x = x.astype(dt)
    if not _DW_SHIFT:
        return m(x)
    probe = dilation * (kernel - 1) + 1
    _ = m(jnp.zeros((1, probe, probe, feats), dt))
    wk = m.variables["params"]["kernel"].astype(dt)  # [K, K, 1, feats]
    pad = dilation * (kernel - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Hh, Ww = x.shape[1], x.shape[2]
    return sum(
        xp[:, ky * dilation : ky * dilation + Hh,
           kx * dilation : kx * dilation + Ww, :] * wk[ky, kx, 0]
        for ky in range(kernel)
        for kx in range(kernel)
    )


def _mix_kernel(mix: nn.Module, c_in: int, dt) -> jnp.ndarray:
    """Materialize a 1x1 no-bias conv submodule and return its kernel as
    [c_in, c_out] so callers can apply it as split matmuls.

    XLA lowers ``conv1x1(concat(a, b))`` by materializing the padded
    concat tensor in HBM (the `pad_maximum` fusions in the XProf trace);
    ``a @ W[:ca] + b @ W[ca:]`` is the same linear map without the
    round-trip. Params are identical either way."""
    _ = mix(jnp.zeros((1, 1, 1, c_in), dt))
    return mix.variables["params"]["kernel"].reshape(c_in, -1).astype(dt)


def _pw_apply(mod: nn.Module, x, c_in: int, dt):
    """Apply a 1x1 conv submodule as a dot_general (+bias), same params.

    At whole-scene geometries the XLA conv lowering of full-resolution
    pointwise convs picks tiled layouts neighboring dots/elementwise
    chains must relayout-copy around (measured ~2 GB copies around the
    HLFR expansion conv, PERF.md r4); the dot form keeps one layout."""
    _ = mod(jnp.zeros((1, 1, 1, c_in), dt))
    p = mod.variables["params"]
    y = x.astype(dt) @ p["kernel"].reshape(c_in, -1).astype(dt)
    if "bias" in p:
        y = y + p["bias"].astype(dt)
    return y


class ECA(nn.Module):
    """Efficient channel attention (V8:816-830)."""

    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.reduction, 16)
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.relu(conv(hidden, 1, dtype=self.dtype)(y))
        y = nn.sigmoid(conv(c, 1, dtype=self.dtype)(y))
        return x * y


class IFE(nn.Module):
    """Multi-scale initial feature extraction (V8:296-327)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c3 = self.feats // 3
        dt = self.dtype
        # Explicit names pin the param-tree layout to the original
        # construction order (f3, f5-proj, 5x5 probe, f7-proj, 7x7 probe,
        # fuse, dw, final) so checkpoints stay restorable across the
        # concat-fold rewrites (tests/test_models.py flagship tree pin).
        f3 = conv(c3, 3, padding=1, name="Conv_0", dtype=dt)(x)
        # the two single-output-lane large-kernel convs run as ONE
        # 2-channel 7x7 conv (the 5x5 kernel zero-padded to 7x7) — a
        # 1-lane conv wastes 127/128 lanes, and XLA can't merge them
        k5_m = conv(1, 5, padding=2, use_bias=False, name="Conv_2", dtype=dt)
        k7_m = conv(1, 7, padding=3, use_bias=False, name="Conv_4", dtype=dt)
        _ = k5_m(jnp.zeros((1, 8, 8, x.shape[-1]), dt))
        _ = k7_m(jnp.zeros((1, 8, 8, x.shape[-1]), dt))
        k5 = k5_m.variables["params"]["kernel"]
        k7 = k7_m.variables["params"]["kernel"]
        k57 = jnp.concatenate(
            [jnp.pad(k5, ((1, 1), (1, 1), (0, 0), (0, 0))), k7], axis=-1
        ).astype(dt)
        p57 = jax.lax.conv_general_dilated(
            x.astype(dt), k57, (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        f5 = conv(c3, 1, name="Conv_1", dtype=dt)(p57[..., :1])
        f7 = conv(self.feats - 2 * c3, 1, name="Conv_3", dtype=dt)(p57[..., 1:])
        fuse_m = conv(self.feats, 1, use_bias=False, name="Conv_5", dtype=dt)
        wf = _mix_kernel(fuse_m, self.feats, dt)
        fused = (
            f3.astype(dt) @ wf[:c3]
            + f5.astype(dt) @ wf[c3 : 2 * c3]
            + f7.astype(dt) @ wf[2 * c3 :]
        )
        enh = _dw_apply(fused, self.feats, dt, name="Conv_6")
        enh = lrelu(
            conv(self.feats, 1, use_bias=False, name="Conv_7", dtype=dt)(enh)
        )
        scale = self.param("scale", nn.initializers.constant(0.2), (1,))
        return fused + scale * enh


class MultiScaleLocal(nn.Module):
    """Channel-split local branch: 1x1 + three depthwise 3x3 (V8:779-800).

    The three 16-channel depthwise 3x3 branches are one depthwise conv
    over the upper 3c channels (depthwise = per-channel, so splitting is
    purely notational) — profiled 2x faster than three narrow-lane convs.
    """

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.feats // 4
        dt = self.dtype
        head_m = conv(c, 1, use_bias=False, dtype=dt)
        rest = _dw_apply(x[..., c:], self.feats - c, dt)
        mix = conv(self.feats, 1, use_bias=False, dtype=dt)
        # fold the 16-lane head conv through the mixing conv and split the
        # concat: lrelu(mix(concat(head(x16), rest))) ==
        # lrelu(x16 @ (Wh @ Wm[:c]) + rest @ Wm[c:]) — removes a 1/8-lane
        # conv, a slice, and the padded concat round-trip
        _ = head_m(jnp.zeros((1, 1, 1, c), dt))
        wh = head_m.variables["params"]["kernel"].reshape(c, c).astype(dt)
        wm = _mix_kernel(mix, self.feats, dt)
        y = lrelu(
            x[..., :c].astype(dt) @ (wh @ wm[:c]) + rest @ wm[c:]
        )
        return y + x


class CrossScanSSM(nn.Module):
    """4-way cross-scan through one shared Mamba (V8:375-455).

    Channel groups 0..3 read the raster: row-major, reversed row-major,
    column-major, reversed column-major. One selective scan processes the
    concatenated channels; outputs are un-permuted back.
    """

    feats: int
    d_state: int
    d_conv: int
    expand: float
    dtype: jnp.dtype
    scan_impl: str = "pallas"

    @nn.compact
    def __call__(self, x):
        from lfsr_tpu.ops import pallas_layout as pll

        b, h, w, c = x.shape
        g = c // 4
        dt = self.dtype

        ln = nn.LayerNorm(dtype=dt)
        mamba = Mamba(
            d_model=c,
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expand,
            scan_impl=self.scan_impl,
            dtype=dt,
            name="mamba",
        )
        mix = conv(c, 1, use_bias=False, dtype=dt)
        scale = self.param("scale", nn.initializers.constant(0.15), (1,))

        if pll._gather_supported(x):
            # Fused path: the 4-way permute + LayerNorm run as ONE Pallas
            # pass (no permuted copies in HBM), and the un-permute + 1x1
            # mixing conv + scaled residual as another (ops/pallas_layout).
            # Materialize the (param-compatible) submodule variables.
            _ = mix(ln(jnp.zeros((1, 1, 1, c), dt)))
            gamma = ln.variables["params"]["scale"]
            beta = ln.variables["params"]["bias"]
            w1 = mix.variables["params"]["kernel"].reshape(c, c)
            seq = pll.cross_scan_gather(x, gamma, beta)
            out = mamba(seq)
            return pll.cross_scan_scatter(out, x, w1.astype(dt), scale)

        # XLA fallback (non-square maps / non-TPU): per-group directional
        # relayouts. Measured both ways on v5e: transforming full-width
        # tensors then lane-slicing materializes 3 extra 52 MB tensors per
        # block (+20 ms/model); the narrow per-group strided copies below
        # are cheaper despite poor stride patterns. (PERF.md.)
        gs = [x[..., :g], x[..., g : 2 * g], x[..., 2 * g : 3 * g], x[..., 3 * g :]]
        s0 = gs[0].reshape(b, h * w, g)
        s1 = gs[1].reshape(b, h * w, g)[:, ::-1]
        s2 = gs[2].transpose(0, 2, 1, 3).reshape(b, h * w, g)
        s3 = gs[3].transpose(0, 2, 1, 3).reshape(b, h * w, c - 3 * g)[:, ::-1]

        seq = jnp.concatenate([s0, s1, s2, s3], axis=-1)
        seq = ln(seq)
        out = mamba(seq)

        o0, o1, o2, o3 = (
            out[..., :g],
            out[..., g : 2 * g],
            out[..., 2 * g : 3 * g],
            out[..., 3 * g :],
        )
        r0 = o0.reshape(b, h, w, g)
        r1 = o1[:, ::-1].reshape(b, h, w, g)
        r2 = o2.reshape(b, w, h, g).transpose(0, 2, 1, 3)
        r3 = o3[:, ::-1].reshape(b, w, h, c - 3 * g).transpose(0, 2, 1, 3)
        y = jnp.concatenate([r0, r1, r2, r3], -1)

        y = mix(y)
        return x + scale * y


class LFVSSMBlock(nn.Module):
    """Pre-norm dual-branch block: local multi-scale conv || global
    cross-scan SSM -> fuse -> channel attention (V8:333-369)."""

    feats: int
    d_state: int
    d_conv: int
    expand: float
    res_scale_init: float
    dtype: jnp.dtype
    scan_impl: str = "pallas"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from lfsr_tpu.ops import pallas_block as plb

        dt = self.dtype
        ln = nn.LayerNorm(dtype=dt)
        msl = MultiScaleLocal(self.feats, dt)
        if plb._supported(x):
            # Fused front: LayerNorm + the whole local branch in ONE pass
            # over HBM (ops/pallas_block.ln_msl). Materialize the
            # (param-compatible) submodule variables, then fold the head
            # 1x1 through the mixing conv exactly as MultiScaleLocal does.
            c4 = self.feats // 4
            _ = ln(jnp.zeros((1, self.feats), dt))
            _ = msl(jnp.zeros((1, 8, 8, self.feats), dt))
            gamma = ln.variables["params"]["scale"]
            beta = ln.variables["params"]["bias"]
            mp = msl.variables["params"]
            wh = mp["Conv_0"]["kernel"].reshape(c4, c4).astype(dt)
            wm = mp["Conv_2"]["kernel"].reshape(self.feats, self.feats).astype(dt)
            wk = mp["Conv_1"]["kernel"][:, :, 0, :].astype(dt)
            xn, local = plb.ln_msl(
                x.astype(dt), gamma, beta, wh @ wm[:c4], wm[c4:], wk
            )
        else:
            xn = ln(x)
            local = msl(xn)
        glob = CrossScanSSM(
            self.feats, self.d_state, self.d_conv, self.expand, dt,
            scan_impl=self.scan_impl,
        )(xn)
        fuse = conv(self.feats, 1, use_bias=False, dtype=dt)
        wf = _mix_kernel(fuse, 2 * self.feats, dt)
        y = local.astype(dt) @ wf[: self.feats] + glob.astype(dt) @ wf[self.feats :]
        y = ECA(dtype=dt)(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        rs = self.param(
            "res_scale", nn.initializers.constant(self.res_scale_init), (1,)
        )
        return x + rs * y


class WindowAttention(nn.Module):
    """Swin-style 8x8 window MHA with relative-position bias (V8:461-546).

    When the spatial dims tile exactly into windows, the whole block —
    LN, qkv, per-window MHA with bias, out projection, scaled residual —
    runs as one fused Pallas kernel (lfsr_tpu.ops.pallas_attention;
    5.5 ms -> sub-ms at [8,160,160,64] on v5e). The padded path and
    non-standard geometries fall back to the XLA formulation. Parameters
    are identical between the two paths.
    """

    feats: int
    heads: int = 4
    window: int = 8
    attn_scale_init: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from lfsr_tpu.ops.pallas_attention import window_mha_fused

        b, h, w, c = x.shape
        ws = self.window
        dt = self.dtype

        ln = nn.LayerNorm(dtype=dt)
        dense_qkv = nn.Dense(3 * c, use_bias=False, dtype=dt)
        dense_out = nn.Dense(c, use_bias=False, dtype=dt)

        # relative position bias table, indexed like Swin (V8:479-495)
        table = self.param(
            "rel_pos_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.heads),
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = (rel + ws - 1).transpose(1, 2, 0)
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(
            ws * ws, ws * ws, self.heads
        )

        scale = self.param(
            "attn_scale", nn.initializers.constant(self.attn_scale_init), (1,)
        )

        if h % ws == 0 and w % ws == 0 and c % self.heads == 0:
            # fused path: bias laid out [T, heads*T] (head h at lane h*T)
            bias_big = bias.transpose(0, 2, 1).reshape(ws * ws, self.heads * ws * ws)
            # materialize the (param-free) submodule variables
            dummy = jnp.zeros((1, 1, c), dt)
            _ = dense_out(dense_qkv(ln(dummy))[..., :c])
            return window_mha_fused(
                x,
                dense_qkv.variables["params"]["kernel"],
                dense_out.variables["params"]["kernel"],
                ln.variables["params"]["scale"],
                ln.variables["params"]["bias"],
                bias_big,
                scale.reshape(()),
                ws,
                self.heads,
                1e-6,
            )

        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect") if ph or pw else x
        hp, wp = xp.shape[1], xp.shape[2]

        win = xp.reshape(b, hp // ws, ws, wp // ws, ws, c)
        win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

        tn = ln(win)
        qkv = dense_qkv(tn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        split = lambda a: a.reshape(-1, ws * ws, self.heads, hd)

        bias_x = bias.transpose(2, 0, 1)[None]  # [1, heads, L, L]

        out = nn.dot_product_attention(split(q), split(k), split(v), bias=bias_x)
        out = dense_out(out.reshape(-1, ws * ws, c))

        out = out.reshape(b, hp // ws, wp // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return x + scale * out


class SpatialAttention(nn.Module):
    """Two-dilation depthwise gate (V8:803-813)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, c = self.dtype, self.feats
        # concat+1x1s as split matmuls; pointwise convs as dots (_pw_apply)
        m1 = _dw_apply(x, c, dt)
        m2 = _dw_apply(x, c, dt, dilation=3)
        wg = _mix_kernel(conv(c, 1, use_bias=False, dtype=dt), 2 * c, dt)
        gate = lrelu(m1 @ wg[:c] + m2 @ wg[c:])
        gate = nn.sigmoid(_pw_apply(conv(c, 1, dtype=dt), gate, c, dt))
        wp = _mix_kernel(conv(c, 1, use_bias=False, dtype=dt), 2 * c, dt)
        proj = m1 @ wp[:c] + m2 @ wp[c:]
        scale = self.param("scale", nn.initializers.constant(0.2), (1,))
        return x + scale * proj * gate


class LSFL(nn.Module):
    """EPI structure learning: h/v dilated depthwise convs, angular gate,
    disparity (SE) modulation (V8:552-608)."""

    feats: int
    ang: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, c = self.dtype, self.feats
        eh = conv(c, (1, 3), dilation=(1, self.ang), padding=(0, self.ang),
                  groups=c, use_bias=False, dtype=dt)(x)
        eh = _pw_apply(conv(c, 1, use_bias=False, dtype=dt), lrelu(eh), c, dt)
        ev = conv(c, (3, 1), dilation=(self.ang, 1), padding=(self.ang, 0),
                  groups=c, use_bias=False, dtype=dt)(x)
        ev = _pw_apply(conv(c, 1, use_bias=False, dtype=dt), lrelu(ev), c, dt)

        # concat+1x1s as split matmuls (no padded-concat materialization)
        wg = _mix_kernel(conv(c, 1, use_bias=False, dtype=dt), 2 * c, dt)
        gate = lrelu(eh @ wg[:c] + ev @ wg[c:])
        gate = nn.sigmoid(_dw_apply(gate, c, dt))
        wp = _mix_kernel(conv(c, 1, use_bias=False, dtype=dt), 2 * c, dt)
        epi = (eh @ wp[:c] + ev @ wp[c:]) * gate

        se = jnp.mean(epi, axis=(1, 2), keepdims=True)
        se = lrelu(conv(c // 4, 1, use_bias=False, dtype=dt)(se))
        se = nn.sigmoid(conv(c, 1, use_bias=False, dtype=dt)(se))
        epi = epi * se

        scale = self.param("scale", nn.initializers.constant(0.3), (1,))
        return x + scale * epi


class ProgressiveFusion(nn.Module):
    """4-stage weighted fusion of the 12 block outputs (V8:614-649)."""

    feats: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, blocks):
        dt, c = self.dtype, self.feats
        # 3 blocks per stage; n_stages generalizes so shrunken-depth
        # configs (e.g. the driver's multi-chip dryrun) reuse the module.
        # The 12-block default yields the original 4-stage layout exactly.
        ns = len(blocks) // 3
        assert 3 * ns == len(blocks), len(blocks)
        # concat+1x1 run as split matmuls (see _mix_kernel)
        stages = []
        for i in range(ns):
            w = _mix_kernel(
                conv(c, 1, use_bias=False, dtype=dt, name=f"proj_s{i+1}"), 3 * c, dt
            )
            stages.append(
                sum(blocks[3 * i + j].astype(dt) @ w[j * c : (j + 1) * c]
                    for j in range(3))
            )
        wts = self.param("stage_weights", nn.initializers.constant(0.25), (ns,))
        wts = nn.softmax(wts)
        weighted = sum(wts[i] * stages[i] for i in range(ns))

        wc = _mix_kernel(conv(c, 1, use_bias=False, dtype=dt), ns * c, dt)
        cross = sum(stages[i].astype(dt) @ wc[i * c : (i + 1) * c] for i in range(ns))
        cross = lrelu(cross)
        cross = _dw_apply(cross, c, dt)
        cross = conv(c, 1, use_bias=False, dtype=dt)(cross)

        scale = self.param("scale", nn.initializers.constant(0.3), (1,))
        return weighted + scale * cross


def _fold_out_conv(k3, r):
    """Fold a 3x3 HR conv (C_in, 1 out) through a preceding r-fold pixel
    shuffle: returns a [3, 3, C_in*r*r, r*r] LR kernel such that

        conv3x3(pixel_shuffle(z, r)) == pixel_shuffle(conv3x3_LR(z), r)

    exactly (zero padding on both sides; torch shuffle channel order
    c*r*r + i*r + j). Moving the conv to LR removes the HR shuffle
    round-trip (2x ~420 MB at the eval point) and replaces the
    1-output-lane HR conv that XLA executes ~2x slower (measured
    8.1 ms -> 4.3 ms at [8,320,320,256] on v5e)."""
    kh, kw, cin, _ = k3.shape
    rr = r * r
    # static 0/1 routing tensor M[Y, X, in_phase, out_phase, dy, dx] built
    # host-side; the fold is then ONE einsum (the previous 36 sequential
    # .at[].add() scatters ran on device every forward — 0.2 ms/iter)
    M = np.zeros((3, 3, rr, rr, kh, kw), np.float32)
    for py in range(r):
        for px in range(r):
            for dy in range(-(kh // 2), kh // 2 + 1):
                for dx in range(-(kw // 2), kw // 2 + 1):
                    u, v = py + dy, px + dx
                    Y, iy = u // r, u % r
                    X, ix = v // r, v % r
                    M[Y + 1, X + 1, iy * r + ix, py * r + px,
                      dy + kh // 2, dx + kw // 2] = 1.0
    kf = jnp.einsum(
        "YXioab,abc->YXcio", jnp.asarray(M, k3.dtype), k3[..., 0]
    ).reshape(3, 3, cin * rr, rr)
    return kf


def _apply_folded_taps(z, kf, bias):
    """Apply the folded [3, 3, C, rr] out-conv as one taps-stacked matmul.

    A direct conv with rr=4 output channels uses 4/128 MXU lanes. Stacking
    the 9 taps onto the lane axis — ``zp @ W[C, 9*rr]`` — runs the whole
    contraction at 36 lanes in one pass, and the tap combination becomes 9
    shifted slice-adds of the result (measured 2.9 -> ~1 ms at
    [8,320,320,256] on v5e)."""
    kh, kw, C, rr = kf.shape
    W36 = kf.transpose(2, 0, 1, 3).reshape(C, kh * kw * rr)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t = jax.lax.dot_general(
        zp, W36, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, H+2, W+2, 9*rr] f32
    Hh, Ww = z.shape[1], z.shape[2]
    out = bias.astype(jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            out = out + t[:, ky : ky + Hh, kx : kx + Ww, k * rr : (k + 1) * rr]
    return out


class HLFR(nn.Module):
    """Deep reconstruction head + x2x2 pixel-shuffle upsampler (V8:716-859).

    The final 3x3 -> 1-channel conv is algebraically folded through the
    last pixel shuffle (see _fold_out_conv) — identical parameters and
    math, executed at LR resolution."""

    feats: int
    scale_factor: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt, c = self.dtype, self.feats
        y = x
        for i in range(3):
            y = _pw_apply(conv(c, 1, use_bias=False, dtype=dt),
                          _dw_apply(y, c, dt), c, dt)
            if i < 2:
                y = lrelu(y)
        edge = _dw_apply(jnp.abs(y), c, dt)
        edge = lrelu(_pw_apply(conv(c // 8, 1, use_bias=False, dtype=dt), edge, c, dt))
        edge = nn.sigmoid(_pw_apply(conv(c, 1, use_bias=False, dtype=dt), edge, c // 8, dt))
        y = ECA(reduction=16, dtype=dt)(y * edge + x)

        stages = [2] * (self.scale_factor // 2) if self.scale_factor in (2, 4) else [self.scale_factor]
        out_conv = conv(1, 3, padding=1, dtype=dt)
        for si, r in enumerate(stages):
            y = lrelu(_dw_apply(y, c, dt))
            # phase-expansion 1x1 applied as a dot_general, not a conv op:
            # at whole-scene geometry the conv lowering picks a tiled
            # layout ({3,1,2,0}) the downstream lrelu+taps chain must copy
            # out of — three ~2 GB relayouts at [2,1440,1440,256].
            # Measured 33.9 -> 14.4 ms for the final-stage chain on v5e
            # (PERF.md r4). Identical params/tree (kernel lives in the
            # same Conv module).
            exp_conv = conv(c * r * r, 1, use_bias=False, dtype=dt)
            _ = exp_conv(jnp.zeros((1, 1, 1, c), dt))
            wexp = exp_conv.variables["params"]["kernel"].reshape(c, c * r * r)
            if si == len(stages) - 1:
                # final stage: keep z at LR, fold the out conv through
                # the shuffle (lrelu commutes with the shuffle). The
                # expansion+lrelu+taps chain runs as XLA dots — a fused
                # Pallas version measured SLOWER both ways it can be
                # tiled (ops/pallas_head, retired; PERF.md r4)
                from lfsr_tpu.ops.pallas_head import hlfr_tail

                _ = out_conv(jnp.zeros((1, 4, 4, c), dt))
                k3 = out_conv.variables["params"]["kernel"].astype(dt)
                bias = out_conv.variables["params"]["bias"].astype(dt)
                kf = _fold_out_conv(k3, r)
                out = hlfr_tail(y.astype(dt), wexp.astype(dt), kf, bias, 0.1)
                out = pixel_shuffle(out, r)
            else:
                y = jax.lax.dot_general(
                    y, wexp.astype(dt), (((3,), (0,)), ((), ()))
                )
                y = lrelu(pixel_shuffle(y, r))
        out_scale = self.param("out_scale", nn.initializers.constant(0.5), (1,))
        return out * out_scale


# whole_scene_ok: un-tiled eval is the TPU production default for the
# flagship — fully convolutional, and whole-scene+pad8 PSNR gated >= tiled
# on the trained demo checkpoint (PERF.md round-3 pad sweep: 26.3565 vs
# 26.3562 tiled, 207 vs 573 ms/scene).
@register_model("LFMambaX", loss=losses.composite_v8_builder, whole_scene_ok=True)
class LFMambaX(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Default width/state chosen so the model passes the 20G budget under
        # the HONEST XLA FLOPs count (19.56 GMAC, 693,998 params) — the
        # reference's 72/24 config only fits because fvcore ignores its scan
        # and attention ops (check_efficiency_official.py:156-162). The
        # V8-claimed geometry stays available: model_kwargs={'channels': 72,
        # 'd_state': 24} gives 891,222 params.
        c = self.cfg.mk("channels", 64)
        a = self.cfg.angRes
        s = self.cfg.scale_factor
        d_state = self.cfg.mk("d_state", 16)
        d_conv = self.cfg.mk("d_conv", 4)
        expand = self.cfg.mk("expand", 1.25)
        use_macpi = self.cfg.mk("use_macpi", True)
        scan_impl = self.cfg.mk("scan_impl", "pallas")
        dt = jnp.dtype(self.cfg.compute_dtype)

        # Depth override for cheap-compile harnesses (the driver's
        # multi-chip dryrun): phases is a tuple of (n_blocks, attn_scale)
        # pairs; total blocks must be a multiple of 3 (ProgressiveFusion
        # groups in 3s). The default reproduces the 12-block flagship
        # param tree exactly.
        phases = tuple(
            tuple(p) for p in self.cfg.mk(
                "phases", ((4, 0.25), (5, 0.35), (3, None))
            )
        )

        up = bicubic_up(x, s)

        h, w = x.shape[1], x.shape[2]
        macpi = use_macpi and h % a == 0 and w % a == 0
        xin = x
        if macpi:
            xin = sai_to_macpi(x.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        xin = xin.astype(dt)

        shallow = IFE(c, dt)(xin)

        # depth-aware residual scales (V8:276-293)
        nb = sum(n for n, _ in phases)
        if nb == 12:
            res_scales = (
                [0.15 + 0.025 * i for i in range(4)]
                + [0.25 + 0.02 * i for i in range(5)]
                + [0.35 + 0.025 * i for i in range(3)]
            )
        else:
            res_scales = list(np.linspace(0.15, 0.425, nb))
        # rematerialize each block: trades recompute for HBM during training
        # only — at eval the remat barrier blocks XLA fusion (~24% slower).
        # Default OFF since r5: batch-8 SAI-160 training fits HBM without
        # it and the recompute cost is real (A/B on v5e: 432 vs 473
        # ms/step — PERF.md r5). Set model_kwargs={'remat': True} for
        # larger batches/patches that need the memory back.
        BlockCls = (
            nn.remat(LFVSSMBlock, static_argnums=(2,))
            if self.cfg.mk("remat", False) and train
            else LFVSSMBlock
        )
        feat = shallow
        blocks = []
        bi = 0
        for phase, (n, attn_scale) in enumerate(phases):
            for _ in range(n):
                feat = BlockCls(
                    c, d_state, d_conv, expand, res_scales[bi], dt,
                    scan_impl, name=f"block_{bi}",
                )(feat, train)
                blocks.append(feat)
                bi += 1
            if attn_scale is not None:
                feat = WindowAttention(
                    c, attn_scale_init=attn_scale, dtype=dt, name=f"win_attn_{phase}"
                )(feat)

        feat = SpatialAttention(c, dt)(feat)
        feat = LSFL(c, a, dt)(feat)
        staged = ProgressiveFusion(c, dt)(blocks)

        combined = feat + staged + shallow
        out = HLFR(c, s, dt)(combined)

        if macpi:
            out = macpi_to_sai(out.transpose(0, 3, 1, 2), a).transpose(0, 2, 3, 1)
        out = out.astype(jnp.float32)
        return out + up
