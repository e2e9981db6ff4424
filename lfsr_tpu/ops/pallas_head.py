"""Pallas TPU kernel fusing the HLFR head tail: phase-expansion matmul +
LeakyReLU + folded out-conv taps, in ONE pass over HBM.

Under XLA the flagship's final upsample stage materializes the expanded
``z = lrelu(y @ W1)`` tensor — [2, 1440, 1440, 256] bf16 = 2.1 GB at the
whole-scene bench geometry — then pads and contracts it with the folded
out-conv taps (lfmambax._apply_folded_taps). The XProf trace shows the
lrelu/pad materialization (compare_select_fusion, 16.4 ms) plus the taps
dot (4.0 ms) as the top non-scan ops (PERF.md r4). This kernel reads the
pre-expansion ``y`` [B, S, S, C] once per band and keeps z entirely in
VMEM: z-band = lrelu(band @ W1) -> column-pad -> nine shifted [Cz, rr]
tap matmuls accumulated in f32 -> out [B, S, S, rr].

The tap halo is one row each side, fed via clamped single-row BlockSpecs
and zeroed at the array edges (zero-pad conv semantics — lrelu(0) = 0 so
padding before or after the nonlinearity is equivalent). Math matches
lfmambax's `dot -> lrelu -> _apply_folded_taps` chain op-for-op (bf16
matmuls, f32 accumulation); backward runs through the XLA reference
(custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests set this to exercise the kernel in interpret mode on CPU.
FORCE_KERNEL_INTERPRET = False


def _tail_kernel(y_ref, ya_ref, yb_ref, w1_ref, wt_ref, bias_ref, o_ref,
                 *, S, rb, nt, rr, slope):
    f32 = jnp.float32
    t = pl.program_id(1)

    band = y_ref[0].astype(jnp.bfloat16)          # [rb, S, C]
    above = ya_ref[0].astype(jnp.bfloat16)        # [1, S, C]
    below = yb_ref[0].astype(jnp.bfloat16)
    above = jnp.where(t == 0, jnp.zeros_like(above), above)
    below = jnp.where(t == nt - 1, jnp.zeros_like(below), below)
    rows = jnp.concatenate([above, band, below], axis=0)  # [rb+2, S, C]

    w1 = w1_ref[...].astype(jnp.bfloat16)         # [C, Cz]
    # f32 accumulation (Mosaic requires 32-bit matmul acc) rounded to
    # bf16 — identical to the XLA chain's bf16 dot (f32 acc + round) —
    # THEN the lrelu on the rounded z, matching the XLA rounding order
    z = jax.lax.dot_general(
        rows, w1, (((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(jnp.bfloat16)
    # predicate in f32: bf16 comparisons fail Mosaic lowering on v5e
    z = jnp.where(z.astype(f32) >= 0.0, z, slope * z)
    Cz = z.shape[-1]
    zp = jnp.concatenate(
        [jnp.zeros((rb + 2, 1, Cz), jnp.bfloat16), z,
         jnp.zeros((rb + 2, 1, Cz), jnp.bfloat16)], axis=1,
    )  # [rb+2, S+2, Cz]

    # ONE [Cz, 9*rr] taps matmul (36 output lanes >> nine 4-lane
    # matmuls, which waste 31/32 of the MXU width — measured 23 ms vs
    # 13.4 for the XLA chain), then tap combination as 9 lane-sliced
    # shifted VPU adds
    w36 = wt_ref[...].astype(jnp.bfloat16)  # [Cz, 9*rr], lane = k*rr + p
    tt = jax.lax.dot_general(
        zp, w36, (((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # [rb+2, S+2, 9*rr] f32
    acc = jnp.broadcast_to(bias_ref[0].astype(f32), (rb, S, rr))
    for ky in range(3):
        for kx in range(3):
            k = 3 * ky + kx
            acc = acc + tt[ky : ky + rb, kx : kx + S, k * rr : (k + 1) * rr]
    o_ref[0] = acc


def hlfr_tail_ref(y, w1, kf, bias, slope=0.1):
    """XLA reference: the exact chain this kernel replaces."""
    from lfsr_tpu.models.lfmambax import _apply_folded_taps

    dt = y.dtype
    z = jax.lax.dot_general(y, w1.astype(dt), (((3,), (0,)), ((), ())))
    z = jnp.where(z >= 0, z, jnp.asarray(slope, z.dtype) * z)
    return _apply_folded_taps(z.astype(dt), kf.astype(dt), bias)


def _supported(y) -> bool:
    if FORCE_KERNEL_INTERPRET:
        return True
    # MEASURED NEGATIVE on v5e — the kernel is retired from the
    # production path (hlfr_tail always takes the XLA reference chain):
    # v1 (nine per-tap matmuls) 23.0 ms vs 13.4 XLA at [2,1440,1440,64]
    # (4-output-lane matmuls waste 31/32 of the MXU width); v2 (one
    # [Cz,36] taps matmul + lane-sliced shifted adds) 13.6 ms at the 4x
    # SMALLER [2,720,720,64] point — the k*rr lane-offset slices hit
    # Mosaic's gather rule (the same constraint pallas_block works
    # around by zero-padding weights to full C, which has no analogue
    # here). The XLA chain's only over-floor cost is one z
    # materialization; PERF.md r4.
    return False


def _pick_rb(S: int) -> int:
    for d in (8, 16):
        if S % d == 0:
            return d
    return S


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hlfr_tail(y, w1, kf, bias, slope=0.1):
    """Fused expansion + lrelu + folded-taps: y [B, S, S, C] -> out
    [B, S, S, rr] f32. w1 [C, Cz]; kf [3, 3, Cz, rr]; bias broadcastable
    to [rr] (the HR out-conv's scalar bias)."""
    if not _supported(y):
        return hlfr_tail_ref(y, w1, kf, bias, slope)
    b, S, _, C = y.shape
    rr = kf.shape[-1]
    Cz = kf.shape[2]
    rb = _pick_rb(S)
    nt = S // rb
    # taps-stacked [Cz, 9*rr] with lane = k*rr + p (matches
    # _apply_folded_taps' W36 layout)
    wt = kf.transpose(2, 0, 1, 3).reshape(Cz, 9 * rr)
    bias_v = jnp.broadcast_to(
        jnp.asarray(bias, jnp.float32).reshape(-1), (rr,)
    )[None]

    band = pl.BlockSpec((1, rb, S, C), lambda i, t: (i, t, 0, 0),
                        memory_space=pltpu.VMEM)
    row_above = pl.BlockSpec(
        (1, 1, S, C),
        lambda i, t, _rb=rb: (i, jnp.maximum(t * _rb - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_below = pl.BlockSpec(
        (1, 1, S, C),
        lambda i, t, _rb=rb, _S=S: (i, jnp.minimum((t + 1) * _rb, _S - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    w1_s = pl.BlockSpec(w1.shape, lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    wt_s = pl.BlockSpec((Cz, 9 * rr), lambda i, t: (0, 0),
                        memory_space=pltpu.VMEM)
    bias_s = pl.BlockSpec((1, rr), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    out_s = pl.BlockSpec((1, rb, S, rr), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tail_kernel, S=S, rb=rb, nt=nt, rr=rr, slope=slope),
        grid=(b, nt),
        in_specs=[band, row_above, row_below, w1_s, wt_s, bias_s],
        out_specs=out_s,
        out_shape=jax.ShapeDtypeStruct((b, S, S, rr), jnp.float32),
        interpret=FORCE_KERNEL_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(y, y, y, w1, wt, bias_v)


def _ht_fwd(y, w1, kf, bias, slope):
    return hlfr_tail(y, w1, kf, bias, slope), (y, w1, kf, bias)


def _ht_bwd(slope, res, g):
    y, w1, kf, bias = res
    _, vjp = jax.vjp(lambda *a: hlfr_tail_ref(*a, slope=slope), y, w1, kf, bias)
    return vjp(g)


hlfr_tail.defvjp(_ht_fwd, _ht_bwd)
