"""Pallas TPU kernel fusing the LFVSSMBlock front: LayerNorm + the
MultiScaleLocal branch in ONE pass over HBM.

Under plain XLA the block's pre-norm LayerNorm and the local branch
(channel-split 1x1 + depthwise-3x3 shift-mul-adds + two mixing matmuls,
lfsr_tpu.models.lfmambax.MultiScaleLocal, after MyEfficientLFNetV8.py:
779-800) cost 0.064 + 0.094 ms per block at the Track-2 eval point
(mb=2, [2,160,160,64]) — 1.9 ms/iter across the flagship's 12 blocks,
dominated by extra HBM round-trips for xn and the 9-tap add chain. This
kernel reads x once and writes both xn (consumed by the cross-scan
gather/scatter kernels) and the local-branch output.

Measured full-flagship A/B on v5e (scripts/probes/probe_ln_msl.py):
NEUTRAL-to-slightly-negative in the latency-bound production-eval
regime (mb=2: 18.87 ms XLA vs 19.11 fused, flat across wt=8..40) but a
clear win once batched — mb=4: 50.95 -> 45.00 ms, mb=8: 101.7 -> 85.6 ms
(-16%). The support gate therefore engages the kernel only for
batch >= 4 (training forward, batched eval); mb=2 keeps the XLA path.

Mechanics: grid (B, S/wt) over row bands. The depthwise 3x3 needs a
one-row halo, so the input is passed three times — the band plus two
single-row BlockSpecs whose index maps clamp at the array edges; the
out-of-range rows are zeroed in-kernel to reproduce conv zero padding.

Math matches the XLA path op-for-op (f32 LayerNorm statistics with the
flax fast-variance formula; bf16 matmul outputs; the 9 depthwise taps
accumulated in bf16 in (ky, kx) order), so outputs agree to bf16
rounding. Backward runs through the pure-XLA reference (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# Tests set this to exercise the kernel in interpret mode on CPU.
FORCE_KERNEL_INTERPRET = False


def _ln_f32(v, gamma, beta):
    """flax fast-variance LayerNorm over the last axis, f32 in/out."""
    mean = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(v * v, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (v - mean) * jax.lax.rsqrt(var + _EPS) * gamma[None] + beta[None]


def _ln_msl_kernel(x_ref, xa_ref, xb_ref, g_ref, b_ref, whm_ref, wrest_ref,
                   wk_ref, xn_ref, loc_ref, *, S, wt, C, slope):
    # All tensors stay full-C inside the kernel: channel-offset lane
    # slices ([..., c4:]) hit Mosaic's gather rule, so the caller
    # zero-pads the weights instead (the extra lanes contribute exact
    # zeros to every f32 accumulation).
    f32 = jnp.float32
    t = pl.program_id(1)
    nt = S // wt

    gam = g_ref[0].astype(f32)
    bet = b_ref[0].astype(f32)

    xn = _ln_f32(x_ref[0].astype(f32).reshape(wt * S, C), gam, bet)
    xn_b = xn.astype(xn_ref.dtype).reshape(wt, S, C)
    xn_ref[0] = xn_b

    # halo rows, LayerNorm'd then zeroed at the array edges (conv zero pad)
    above = _ln_f32(xa_ref[0, 0].astype(f32), gam, bet)
    below = _ln_f32(xb_ref[0, 0].astype(f32), gam, bet)
    above = above * jnp.where(t > 0, 1.0, 0.0)
    below = below * jnp.where(t < nt - 1, 1.0, 0.0)

    dt_b = xn_ref.dtype
    col = jnp.concatenate(
        [above[None].astype(dt_b), xn_b, below[None].astype(dt_b)], axis=0
    )  # [wt+2, S, C]
    zc = jnp.zeros((wt + 2, 1, C), dt_b)
    zp = jnp.concatenate([zc, col, zc], axis=1)  # [wt+2, S+2, C]

    # depthwise 3x3 as shift-mul-adds, bf16 accumulation in (ky, kx) order
    # (matches lfmambax._dw_apply exactly); wk rows are zero on the head
    # lanes so the dw only contributes on the rest channels
    rest = None
    for ky in range(3):
        for kx in range(3):
            k = ky * 3 + kx
            tap = wk_ref[k : k + 1, :].astype(dt_b)  # [1, C]
            term = zp[ky : ky + wt, kx : kx + S, :] * tap[None]
            rest = term if rest is None else rest + term

    head = jax.lax.dot_general(
        xn_b.reshape(wt * S, C), whm_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dt_b)
    mixed = jax.lax.dot_general(
        rest.reshape(wt * S, C), wrest_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dt_b)
    y = head + mixed
    # predicate in f32: bf16 comparisons fail Mosaic lowering on v5e
    y = jnp.where(y.astype(f32) >= 0.0, y, slope * y)
    loc_ref[0] = (y.reshape(wt, S, C) + xn_b).astype(loc_ref.dtype)


def ln_msl_ref(x, gamma, beta, whm, wrest, wk, slope=0.1):
    """XLA reference: LayerNorm + MultiScaleLocal composition.

    Replicates LFVSSMBlock's ``xn = LayerNorm(x)`` followed by
    MultiScaleLocal's folded form: ``lrelu(xn16 @ whm + dw(xn48) @ wrest)
    + xn`` (lfmambax.MultiScaleLocal; backward + fallback path).
    """
    f32 = jnp.float32
    c4 = whm.shape[0]
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + _EPS) * gamma.astype(f32) + beta.astype(f32)
    xn = xn.astype(x.dtype)

    xr = xn[..., c4:]
    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hh, Ww = x.shape[1], x.shape[2]
    rest = None
    for ky in range(3):
        for kx in range(3):
            term = xp[:, ky : ky + Hh, kx : kx + Ww, :] * wk[ky, kx][None, None, None]
            rest = term if rest is None else rest + term
    y = xn[..., :c4] @ whm + rest @ wrest
    y = jnp.where(y >= 0, y, slope * y)
    return xn, y + xn


def _supported(x) -> bool:
    """Hardware envelope: square sublane-aligned maps (mirrors the
    cross-scan kernels' conservative gate, pallas_layout._gather_supported).

    Work gate: measured full-flagship A/B on v5e at [B,160,160,64] —
    per-patch ms (XLA / fused): B=2 9.44/9.55, B=4 12.74/11.25,
    B=8 12.71/10.70. The kernel loses ~1% in the latency-bound regime
    and wins 12-16% once the dispatch is throughput-bound, so it engages
    above a total-PIXEL threshold (4 x 160^2) rather than a batch count:
    batched training/eval at B >= 4 qualifies as before, and so does a
    single whole-scene mosaic (B=1 at 720^2 = 20 patches of work)."""
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    basic = h == w and h >= 8 and c % 4 == 0
    if FORCE_KERNEL_INTERPRET:
        return basic
    g_tile = 16 if x.dtype == jnp.bfloat16 else 8
    tile_ok = h % 8 == 0 and (c // 4) % g_tile == 0
    return (
        basic and b * h * w >= 4 * 160 * 160 and tile_ok
        and jax.default_backend() == "tpu"
    )


def _pick_wt(S: int, max_wt: int = 40) -> int:
    if FORCE_KERNEL_INTERPRET:
        for d in range(min(max_wt, S), 0, -1):
            if S % d == 0:
                return d
        return 1
    for d in range(min(max_wt, S), 7, -1):
        if S % d == 0 and d % 8 == 0:
            return d
    return S


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ln_msl(x, gamma, beta, whm, wrest, wk, slope=0.1):
    """Fused LayerNorm + MultiScaleLocal: returns (xn, local).

    x: [B, S, S, C]; gamma/beta: [C]; whm: [c4, C] (head 1x1 folded
    through the mixing conv); wrest: [C-c4, C]; wk: [3, 3, C-c4]
    depthwise taps. Falls back to the XLA reference off-TPU or for
    unsupported shapes.
    """
    if not _supported(x):
        return ln_msl_ref(x, gamma, beta, whm, wrest, wk, slope)
    b, S, _, C = x.shape
    c4 = whm.shape[0]
    # Band height: ~40 rows at the 160-wide patch geometry; cap the
    # rows x width product so whole-scene widths (S=720+) keep the
    # in-VMEM working set at the patch-geometry level instead of blowing
    # the scoped limit (measured 42.9 MB at wt=40, S=720).
    wt = _pick_wt(S, max_wt=max(4, (40 * 160) // S))
    nt = S // wt

    # full-C weight forms (zero lanes/rows are exact no-ops; see kernel)
    whm_f = jnp.concatenate([whm, jnp.zeros((C - c4, C), whm.dtype)], axis=0)
    wrest_f = jnp.concatenate([jnp.zeros((c4, C), wrest.dtype), wrest], axis=0)
    wk9 = jnp.concatenate(
        [jnp.zeros((9, c4), wk.dtype), wk.reshape(9, C - c4)], axis=1
    )

    band = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0),
                        memory_space=pltpu.VMEM)
    row_above = pl.BlockSpec(
        (1, 1, S, C),
        lambda i, t, _wt=wt: (i, jnp.maximum(t * _wt - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_below = pl.BlockSpec(
        (1, 1, S, C),
        lambda i, t, _wt=wt, _S=S: (i, jnp.minimum((t + 1) * _wt, _S - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    vec = pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((C, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    wk_s = pl.BlockSpec((9, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)

    out_band = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_msl_kernel, S=S, wt=wt, C=C, slope=slope),
        grid=(b, nt),
        in_specs=[band, row_above, row_below, vec, vec, mat, mat, wk_s],
        out_specs=[out_band, out_band],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=FORCE_KERNEL_INTERPRET,
    )(x, x, x, gamma[None], beta[None], whm_f, wrest_f, wk9)


def _lm_fwd(x, gamma, beta, whm, wrest, wk, slope):
    return ln_msl(x, gamma, beta, whm, wrest, wk, slope), (
        x, gamma, beta, whm, wrest, wk,
    )


def _lm_bwd(slope, res, g):
    _, vjp = jax.vjp(lambda *a: ln_msl_ref(*a, slope=slope), *res)
    return vjp(g)


ln_msl.defvjp(_lm_fwd, _lm_bwd)
