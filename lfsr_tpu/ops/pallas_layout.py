"""Pallas TPU kernels for the 4-way cross-scan layout transforms.

The cross-scan SSM (lfsr_tpu.models.lfmambax.CrossScanSSM, after the
reference's MyEfficientLFNetV8.py:375-455) reads channel groups 0..3 of a
[B, H, W, C] feature map in four raster orders (row-major, reversed
row-major, column-major, reversed column-major), runs one shared Mamba
over the concatenated [B, L, C] sequence, and un-permutes the result.

Under plain XLA the eight narrow (C/4-channel) strided
relayouts + reverses around each of the flagship's 12 SSM blocks are the
single largest non-kernel time bucket (~15 ms/iter of copies at the
Track-2 eval point — see PERF.md). These kernels do each direction of
the shuffle in ONE pass over HBM:

- ``cross_scan_gather``: builds the permuted sequence AND applies the
  pre-Mamba LayerNorm in the same kernel (the LN read was another full
  [B, L, C] round-trip).
- ``cross_scan_scatter``: un-permutes, applies the 1x1 mixing conv on the
  MXU, and adds the scaled residual, writing the block output directly.

Mechanics: the grid is (B, S/wt) over row/column bands of a square S x S
map; the SAME input array is passed four times with different BlockSpec
index maps (rows band t, rows band nt-1-t, cols band t, cols band
nt-1-t), so no permuted copy ever exists in HBM. Sequence reversal is an
anti-diagonal [S, S] matmul on the MXU (Mosaic has no lax.rev lowering);
column slabs are assembled by static mid-dimension slicing.

Both ops carry a custom_vjp whose backward runs through the pure-XLA
reference implementation, so training gradients are exact. Off-TPU or
for non-square/indivisible shapes the reference path runs directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# Tests set this to exercise the kernels in interpret mode on CPU (the
# production dispatch falls back to the XLA reference off-TPU).
FORCE_KERNEL_INTERPRET = False


def _pick_wt(S: int, max_wt: int = 16) -> int:
    """Band width for the column-slab BlockSpecs.

    Mosaic requires the second-to-last block dim to be a multiple of 8 or
    equal to the array dim (wt=12 at S=24 fails to lower on hardware —
    ADVICE r2), so only sublane-aligned divisors are eligible; fall back
    to whole-array slabs otherwise. Interpret mode keeps the old free
    choice (no tiling constraints, and tests cover S=16/24/32 there).
    """
    if FORCE_KERNEL_INTERPRET:
        for d in range(min(max_wt, S), 0, -1):
            if S % d == 0:
                return d
        return 1
    for d in range(min(max_wt, S), 7, -1):
        if S % d == 0 and d % 8 == 0:
            return d
    return S


def _flipmat(S: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (r + c == S - 1).astype(jnp.float32)


def _rev_s(F, slab):
    """Reverse [S, g] along axis 0 via the anti-diagonal MXU matmul."""
    return jax.lax.dot_general(
        F, slab, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# gather: [B, S, S, C] -> LayerNorm(4-way permuted [B, L, C])
# ---------------------------------------------------------------------------


def _gather_kernel(xr_ref, xrr_ref, xc_ref, xcr_ref, gam_ref, bet_ref, o_ref,
                   *, S, wt, C):
    g = C // 4
    T = wt * S
    F = _flipmat(S)

    parts = []
    # group 0: row-major — the rows band flattens directly
    rr = xr_ref[0].astype(jnp.float32).reshape(T, C)
    parts.append(rr[:, :g])

    # group 1: reversed row-major — band nt-1-t, row order and in-row
    # order both reversed (per-slab anti-diagonal matmuls; lane-stacked
    # wide-matmul variants hit unimplemented Mosaic concat relayouts)
    parts.append(
        jnp.concatenate(
            [
                _rev_s(F, xrr_ref[0, wt - 1 - r, :, g : 2 * g].astype(jnp.float32))
                for r in range(wt)
            ],
            axis=0,
        )
    )

    # group 2: column-major — column cc of the cols band is seq rows
    # [cc*S, (cc+1)*S)
    g2 = jnp.concatenate(
        [xc_ref[0, :, cc, 2 * g : 3 * g].astype(jnp.float32) for cc in range(wt)],
        axis=0,
    )
    parts.append(g2)

    # group 3: reversed column-major — cols band nt-1-t, column order and
    # in-column order both reversed
    parts.append(
        jnp.concatenate(
            [
                _rev_s(F, xcr_ref[0, :, wt - 1 - cc, 3 * g :].astype(jnp.float32))
                for cc in range(wt)
            ],
            axis=0,
        )
    )

    seq = jnp.concatenate(parts, axis=1)  # [T, C] f32

    # fused LayerNorm over C (flax fast-variance formula)
    mean = jnp.mean(seq, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(seq * seq, axis=1, keepdims=True) - mean * mean, 0.0)
    y = (seq - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * gam_ref[0].astype(jnp.float32)[None] + bet_ref[0].astype(jnp.float32)[None]
    o_ref[0] = y.astype(o_ref.dtype)


def cross_scan_gather_ref(x, gamma, beta):
    """XLA reference: permute+concat+LayerNorm (backward + fallback path)."""
    b, h, w, c = x.shape
    g = c // 4
    gs = [x[..., :g], x[..., g : 2 * g], x[..., 2 * g : 3 * g], x[..., 3 * g :]]
    s0 = gs[0].reshape(b, h * w, g)
    s1 = gs[1].reshape(b, h * w, g)[:, ::-1]
    s2 = gs[2].transpose(0, 2, 1, 3).reshape(b, h * w, g)
    s3 = gs[3].transpose(0, 2, 1, 3).reshape(b, h * w, c - 3 * g)[:, ::-1]
    seq = jnp.concatenate([s0, s1, s2, s3], axis=-1)
    f32 = jnp.float32
    sf = seq.astype(f32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(sf * sf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * gamma.astype(f32) + beta.astype(f32)
    return y.astype(x.dtype)


def cross_scan_gather_v2(x, gamma, beta):
    """XLA formulation #2 of the gather (r5 whole-scene attack).

    Identities: for a row-major raster, reversing the flattened sequence
    equals flipping BOTH spatial dims before the flatten; and the
    column-major pair is the row-major read of the spatially transposed
    map. So both reversed groups become one double-flip each and groups
    2/3 share a transpose — all full-tensor relayouts XLA lowers as
    single wide copies, instead of the reference's narrow per-group
    1-D reverses. Math identical to :func:`cross_scan_gather_ref`."""
    b, h, w, c = x.shape
    g = c // 4
    L = h * w
    s0 = x[..., :g].reshape(b, L, g)
    s1 = x[:, ::-1, ::-1, g : 2 * g].reshape(b, L, g)
    s2 = x[..., 2 * g : 3 * g].transpose(0, 2, 1, 3).reshape(b, L, g)
    s3 = (
        x[:, ::-1, ::-1, 3 * g :].transpose(0, 2, 1, 3).reshape(b, L, c - 3 * g)
    )
    seq = jnp.concatenate([s0, s1, s2, s3], axis=-1)
    f32 = jnp.float32
    sf = seq.astype(f32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(sf * sf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + _EPS)
    y = y * gamma.astype(f32) + beta.astype(f32)
    return y.astype(x.dtype)


def cross_scan_scatter_v2(seq, x, w, scale):
    """XLA formulation #2 of the scatter: the mixing conv splits over the
    4 channel groups (y = sum_k unperm_k(o_k) @ W_k) and flips/transposes
    commute with the per-pixel matmul, so the two scan-space halves are
    mixed FIRST (thin matmuls) and un-permuted as one double-flip + one
    full-width transpose. Math identical to
    :func:`cross_scan_scatter_ref` up to f32 add order."""
    b, h, wdt, c = x.shape
    g = c // 4
    f32 = jnp.float32
    wc = w.astype(seq.dtype)
    o0 = seq[..., :g]
    o1 = seq[..., g : 2 * g]
    o2 = seq[..., 2 * g : 3 * g]
    o3 = seq[..., 3 * g :]
    # row-major half: a = o0 @ W0 + rev_L(o1) @ W1, computed in scan space
    # with the reversal as a double-flip after reshape-to-map
    a = (o0 @ wc[:g]).reshape(b, h, wdt, c) + (
        (o1 @ wc[g : 2 * g]).reshape(b, h, wdt, c)[:, ::-1, ::-1]
    )
    # column-major half: same, then one full-width spatial transpose
    bb = (o2 @ wc[2 * g : 3 * g]).reshape(b, wdt, h, c) + (
        (o3 @ wc[3 * g :]).reshape(b, wdt, h, c)[:, ::-1, ::-1]
    )
    y = a.astype(f32) + bb.transpose(0, 2, 1, 3).astype(f32)
    return (x.astype(f32) + scale * y).astype(x.dtype)


# Cross-scan implementation switch (r5 whole-scene attack): 'kernel' =
# the fused Pallas passes (default), 'xla' = the reference XLA forms,
# 'xla_v2' = the double-flip/shared-transpose forms, 'mixed' = xla_v2
# gather + kernel scatter (the standalone-probe winner per half).
# End-to-end A/B on the whole-scene production runner (scripts/probes/
# probe_cross_scan_e2e.py, H0=128 mb=4): kernel 3.808 scenes/s, xla
# 3.490, xla_v2 2.726 — the standalone micro-wins (gather v2 2.80 ms vs
# kernel 4.82 at S=720) do NOT survive fusion context, so the production
# default stays 'kernel'. Read at trace time; switching clears jit
# caches (same contract as pallas_scan.set_scan_bwd_impl).
_CROSS_SCAN = {"impl": "kernel"}


def set_cross_scan_impl(impl: str):
    assert impl in ("kernel", "xla", "xla_v2", "mixed"), impl
    if _CROSS_SCAN["impl"] != impl:
        _CROSS_SCAN["impl"] = impl
        jax.clear_caches()


def _gather_supported(x) -> bool:
    """Shape envelope for the fused cross-scan kernels.

    Conservative by design (ADVICE r2): interpret-mode tests don't
    exercise Mosaic tiling, so on hardware we only take the kernel for
    geometries whose tile structure matches what has been validated on a
    real chip (S=160/C=64 production path and the S%8==0 family): square
    maps, S a multiple of 8 (so wt from _pick_wt is 8 or 16 and every
    BlockSpec slab is sublane-aligned), and per-group channels g=C/4 a
    multiple of the dtype sublane tile (8 f32 / 16 bf16). Anything else
    falls back to the XLA reference path.
    """
    b, h, w, c = x.shape
    basic = h == w and h >= 8 and c % 4 == 0
    if FORCE_KERNEL_INTERPRET:
        return basic  # interpret mode has no tiling constraints
    g_tile = 16 if x.dtype == jnp.bfloat16 else 8
    tile_ok = h % 8 == 0 and (c // 4) % g_tile == 0
    return basic and tile_ok and jax.default_backend() == "tpu"


@jax.custom_vjp
def cross_scan_gather(x, gamma, beta):
    """4-way cross-scan permute + LayerNorm in one HBM pass.

    x: [B, S, S, C] (square); gamma/beta: [C]. Returns [B, S*S, C] in
    x.dtype. Falls back to the XLA reference off-TPU or for unsupported
    shapes.
    """
    if not _gather_supported(x):
        return cross_scan_gather_ref(x, gamma, beta)
    if _CROSS_SCAN["impl"] == "xla":
        return cross_scan_gather_ref(x, gamma, beta)
    if _CROSS_SCAN["impl"] in ("xla_v2", "mixed"):
        return cross_scan_gather_v2(x, gamma, beta)
    b, S, _, C = x.shape
    wt = _pick_wt(S)
    nt = S // wt
    T = wt * S

    rows = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0),
                        memory_space=pltpu.VMEM)
    rows_rev = pl.BlockSpec((1, wt, S, C), lambda i, t, _nt=nt: (i, _nt - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)
    cols = pl.BlockSpec((1, S, wt, C), lambda i, t: (i, 0, t, 0),
                        memory_space=pltpu.VMEM)
    cols_rev = pl.BlockSpec((1, S, wt, C), lambda i, t, _nt=nt: (i, 0, _nt - 1 - t, 0),
                            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_gather_kernel, S=S, wt=wt, C=C),
        grid=(b, nt),
        in_specs=[rows, rows_rev, cols, cols_rev, wspec, wspec],
        out_specs=pl.BlockSpec((1, T, C), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, S * S, C), x.dtype),
        interpret=FORCE_KERNEL_INTERPRET,
        # whole-scene geometries (S=640) push the double-buffered band
        # blocks past the 16 MB default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, x, x, x, gamma[None], beta[None])


def _csg_fwd(x, gamma, beta):
    return cross_scan_gather(x, gamma, beta), (x, gamma, beta)


def _csg_bwd(res, g):
    _, vjp = jax.vjp(cross_scan_gather_ref, *res)
    return vjp(g)


cross_scan_gather.defvjp(_csg_fwd, _csg_bwd)


# ---------------------------------------------------------------------------
# scatter: un-permute [B, L, C] + 1x1 conv + scaled residual
# ---------------------------------------------------------------------------


def _scatter_kernel(sr_ref, srr_ref, sc_ref, scr_ref, x_ref, w_ref, sc_s_ref,
                    o_ref, *, S, wt, C):
    g = C // 4
    T = wt * S
    F = _flipmat(S)

    parts = [sr_ref[0].astype(jnp.float32).reshape(T, C)[:, :g]]

    # group 1: r1[h, w] = o1[L-1-(h*S+w)]  — same index algebra as the
    # gather's group 1 (the permutation is an involution); all wt slabs
    # reversed by one wide MXU matmul
    parts.append(
        jnp.concatenate(
            [
                _rev_s(F, srr_ref[0, wt - 1 - r, :, g : 2 * g].astype(jnp.float32))
                for r in range(wt)
            ],
            axis=0,
        )
    )

    # group 2: r2[h, w] = o2[w*S + h] — mid-dim slab per local row
    parts.append(
        jnp.concatenate(
            [sc_ref[0, :, hh, 2 * g : 3 * g].astype(jnp.float32) for hh in range(wt)],
            axis=0,
        )
    )

    # group 3: r3[h, w] = o3[L-1-(w*S+h)]
    parts.append(
        jnp.concatenate(
            [
                _rev_s(F, scr_ref[0, :, wt - 1 - hh, 3 * g :].astype(jnp.float32))
                for hh in range(wt)
            ],
            axis=0,
        )
    )

    z = jnp.concatenate(parts, axis=1)  # [T, C] f32
    W = w_ref[:]  # [C, C] — 1x1 mixing conv on the MXU in the weight dtype
    y = jax.lax.dot_general(
        z.astype(W.dtype), W, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xb = x_ref[0].astype(jnp.float32).reshape(T, C)
    out = xb + sc_s_ref[0, 0] * y
    o_ref[0] = out.reshape(wt, S, C).astype(o_ref.dtype)


def cross_scan_scatter_ref(seq, x, w, scale):
    """XLA reference: un-permute + 1x1 conv + scaled residual."""
    b, h, wdt, c = x.shape
    g = c // 4
    o0 = seq[..., :g]
    o1 = seq[..., g : 2 * g]
    o2 = seq[..., 2 * g : 3 * g]
    o3 = seq[..., 3 * g :]
    r0 = o0.reshape(b, h, wdt, g)
    r1 = o1[:, ::-1].reshape(b, h, wdt, g)
    r2 = o2.reshape(b, wdt, h, g).transpose(0, 2, 1, 3)
    r3 = o3[:, ::-1].reshape(b, wdt, h, c - 3 * g).transpose(0, 2, 1, 3)
    y = jnp.concatenate([r0, r1, r2, r3], -1)
    y = jnp.einsum("bhwc,cd->bhwd", y.astype(w.dtype), w)
    return (x.astype(jnp.float32) + scale * y.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def cross_scan_scatter(seq, x, w, scale):
    """Un-permute the cross-scan output + 1x1 conv + scaled residual.

    seq: [B, S*S, C]; x: [B, S, S, C] residual input; w: [C, C] 1x1
    kernel; scale: [] or [1]. Returns [B, S, S, C] in x.dtype.
    """
    if not _gather_supported(x):
        return cross_scan_scatter_ref(seq, x, w, scale)
    if _CROSS_SCAN["impl"] == "xla":
        return cross_scan_scatter_ref(seq, x, w, scale)
    if _CROSS_SCAN["impl"] == "xla_v2":
        return cross_scan_scatter_v2(seq, x, w, scale)
    b, S, _, C = x.shape
    wt = _pick_wt(S)
    nt = S // wt

    seq4 = seq.reshape(b, S, S, C)
    rows = pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0),
                        memory_space=pltpu.VMEM)
    rows_rev = pl.BlockSpec((1, wt, S, C), lambda i, t, _nt=nt: (i, _nt - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)
    cols = pl.BlockSpec((1, S, wt, C), lambda i, t: (i, 0, t, 0),
                        memory_space=pltpu.VMEM)
    cols_rev = pl.BlockSpec((1, S, wt, C), lambda i, t, _nt=nt: (i, 0, _nt - 1 - t, 0),
                            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((C, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM)

    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, S=S, wt=wt, C=C),
        grid=(b, nt),
        in_specs=[rows, rows_rev, cols, cols_rev, rows, wspec, sspec],
        out_specs=pl.BlockSpec((1, wt, S, C), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, S, S, C), x.dtype),
        interpret=FORCE_KERNEL_INTERPRET,
        # see cross_scan_gather: whole-scene S=640 needs > 16 MB scoped
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(seq4, seq4, seq4, seq4, x, w, scale_arr)


def _css_fwd(seq, x, w, scale):
    return cross_scan_scatter(seq, x, w, scale), (seq, x, w, scale)


def _css_bwd(res, g):
    _, vjp = jax.vjp(cross_scan_scatter_ref, *res)
    return vjp(g)


cross_scan_scatter.defvjp(_css_fwd, _css_bwd)
