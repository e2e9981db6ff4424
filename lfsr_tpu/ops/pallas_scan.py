"""Pallas TPU kernel for the selective (Mamba) scan.

Why a kernel: the associative_scan formulation materializes O(log L)
[B, L, D, N] intermediates in HBM (~35 MB each at the Track-2 eval point,
per block). This kernel streams T-sized chunks through VMEM, carrying only
the [D, N] boundary state between chunks, and runs a Hillis-Steele
inclusive scan over each chunk on the VPU — HBM traffic drops to the
inputs/outputs.

Layout: grid = (B, L/T); the L-chunk axis is the fastest-varying grid
dimension, and TPU grid execution is sequential on a core, so the carry
lives in VMEM scratch across chunk steps (zeroed at chunk 0 of each batch
row). All math in float32.

Differentiability: ``selective_scan_fused`` wraps the kernel in a
custom_vjp whose backward recomputes through the associative-scan
implementation (lfsr_tpu.ops.selective_scan) — forward stays fused and
memory-lean, training gradients stay exact.

Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfsr_tpu.ops import selective_scan as ssref


def _scan_chunk_kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_carry, *, T, inner,
                       pre_softplus=False):
    """One (batch row, block-of-chunks) grid step.

    The block holds ``inner`` consecutive chunks of length T; a fori_loop
    walks them, carrying the [N, D] state in registers. Grid steps are the
    expensive resource on TPU (each has dispatch + DMA-setup latency), so
    packing many chunks per step is what makes the kernel latency-lean —
    the original one-chunk-per-step layout spent ~80% of its wall time on
    grid overhead at L=25600.
    """
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    A = a_ref[:].astype(jnp.float32)  # [N, D] (pre-transposed by caller)
    N, D = A.shape

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)    # [T, D]
        dt = dt_ref[0, sl, :].astype(jnp.float32)  # [T, D]
        if pre_softplus:
            # dt arrives pre-activation (bf16-streamable); activate in f32
            dt = jax.nn.softplus(dt)
        Bc = b_ref[0, sl, :].astype(jnp.float32)   # [T, N]
        Cc = c_ref[0, sl, :].astype(jnp.float32)   # [T, N]

        # ZOH discretization in [T, N, D] layout: D rides the 128-lane
        # axis and the scan runs along the untiled leading T axis.
        dA = jnp.exp(dt[:, None, :] * A[None])        # [T, N, D]
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]   # [T, N, D]
        y, h_new = _chunk_scan(dA, dBx, Cc, h0, T=T, N=N, D=D)
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def _chunk_scan_flat(dA, dBx, Cf, e2, h0, *, T, N, D):
    """Work-efficient two-level inclusive scan in flat-lane layout.

    dA/dBx/Cf: [T, N*D] (n-major, d-minor flattening — all 128-lane tiles
    fully packed when N*D % 128 == 0, vs ~62% utilization with D=80 on
    the lane axis); e2: [N*D, D] one-hot segment-sum matrix; h0: [1, N*D].
    Returns (y [T, D], new h0 [1, N*D]). The n-reduction runs on the MXU
    (Mosaic cannot shape-cast the lane dim back to [.., N, D])."""
    ND = N * D
    S = 8 if T % 8 == 0 and T >= 64 else 1
    M = T // S
    a4 = dA.reshape(M, S, ND)
    b4 = dBx.reshape(M, S, ND)
    c4 = Cf.reshape(M, S, ND)
    sa = [a4[:, s] for s in range(S)]
    sb = [b4[:, s] for s in range(S)]
    for s in range(1, S):
        sb[s] = sb[s] + sa[s] * sb[s - 1]
        sa[s] = sa[s] * sa[s - 1]
    ta, tb = sa[S - 1], sb[S - 1]
    shift = 1
    while shift < M:
        pa = jnp.concatenate(
            [jnp.ones((shift, ND), jnp.float32), ta[: M - shift]], axis=0
        )
        pb = jnp.concatenate(
            [jnp.zeros((shift, ND), jnp.float32), tb[: M - shift]], axis=0
        )
        tb = tb + ta * pb
        ta = ta * pa
        shift *= 2
    pstate = jnp.concatenate([h0, tb[: M - 1] + ta[: M - 1] * h0], axis=0)
    hc = jnp.stack(
        [(sb[s] + sa[s] * pstate) * c4[:, s] for s in range(S)], axis=1
    ).reshape(T, ND)
    y = jax.lax.dot_general(
        hc, e2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, D] — segment-sum over n via one-hot MXU matmul
    return y, (tb[M - 1] + ta[M - 1] * h0[0])[None]


def _scan_chunk_kernel_flat(u_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_carry,
                            *, T, inner, N, pre_softplus=False):
    """Flat-lane variant of _scan_chunk_kernel: the (state, channel) pair
    axis rides the 128-lane dimension fully packed. h_carry: [1, N*D]."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    A_flat = a_ref[:].astype(jnp.float32)  # [1, N*D], n-major
    ND = A_flat.shape[1]
    D = ND // N

    # one-hot broadcast/reduce matrices built from iota (no lane reshapes):
    # eb[n, n*D+d] = 1 spreads [T, N] across the flat axis on the MXU;
    # e2[n*D+d, d] = 1 segment-sums the flat axis back to [T, D]
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (N, ND), 1)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (N, ND), 0)
    eb = (lane_b // D == row_b).astype(jnp.float32)
    row_2 = jax.lax.broadcasted_iota(jnp.int32, (ND, D), 0)
    lane_2 = jax.lax.broadcasted_iota(jnp.int32, (ND, D), 1)
    e2 = (row_2 % D == lane_2).astype(jnp.float32)

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)    # [T, D]
        dt = dt_ref[0, sl, :].astype(jnp.float32)  # [T, D]
        if pre_softplus:
            dt = jax.nn.softplus(dt)
        Bc = b_ref[0, sl, :].astype(jnp.float32)   # [T, N]
        Cc = c_ref[0, sl, :].astype(jnp.float32)   # [T, N]

        dtf = pltpu.repeat(dt, N, axis=1)              # [T, N*D]
        wf = pltpu.repeat(dt * u, N, axis=1)
        bcast = lambda m: jax.lax.dot_general(
            m, eb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dA = jnp.exp(dtf * A_flat)
        dBx = bcast(Bc) * wf
        y, h_new = _chunk_scan_flat(dA, dBx, bcast(Cc), e2, h0, T=T, N=N, D=D)
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def _scan_proj_kernel(u_ref, dbc_ref, wdt_ref, bdt_ref, a_ref, y_ref, h_carry,
                      *, T, inner, R, combine_dtype=jnp.float32):
    """Scan with the dt projection and B/C extraction folded in.

    dbc is the raw x_proj output [blk, R+2N]: lanes [0,R) are the
    low-rank dt, [R,R+N) B, [R+N,R+2N) C. Feeding it whole removes the
    narrow [B, L, N] lane-extraction fusions + their layout copies and
    the [B, L, D] dt_raw round-trip that XLA otherwise materializes
    between x_proj and the kernel (~0.3 ms/block at the eval point).

    ``combine_dtype=bfloat16`` runs the [T, N, D] discretization +
    Hillis-Steele combine in bf16 (chunk-boundary carry stays f32) —
    an opt-in eval-speed experiment; see set_scan_combine_dtype.
    """
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    A = a_ref[:].astype(jnp.float32)  # [N, D]
    N, D = A.shape
    Wdt = wdt_ref[:].astype(jnp.float32)  # [R, D]
    bdt = bdt_ref[:].astype(jnp.float32)  # [1, D]

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)       # [T, D]
        dbc = dbc_ref[0, sl, :].astype(jnp.float32)   # [T, R+2N]
        dt = jax.nn.softplus(
            jnp.dot(dbc[:, :R], Wdt, preferred_element_type=jnp.float32) + bdt
        )
        Bc = dbc[:, R : R + N]
        Cc = dbc[:, R + N : R + 2 * N]

        dA = jnp.exp(dt[:, None, :] * A[None])        # [T, N, D]
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]   # [T, N, D]
        if combine_dtype != jnp.float32:
            # Cc stays f32: it only feeds the (always-f32) output sum, and
            # a bf16 [M, N] -> [M, N, 1] minor-dim reshape is unsupported
            # by Mosaic (hit at the whole-scene shape).
            y, h_new = _chunk_scan(
                dA.astype(combine_dtype), dBx.astype(combine_dtype),
                Cc, h0, T=T, N=N, D=D, dtype=combine_dtype,
            )
        else:
            y, h_new = _chunk_scan(dA, dBx, Cc, h0, T=T, N=N, D=D)
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


# Eval-only combine-precision switch for the dbc-input scan kernel (the
# production eval path): 'float32' (default) or 'bfloat16'. Read at trace
# time; switching clears jit caches (same contract as set_scan_bwd_impl).
# Training is unaffected — the train forward (_scan_proj_raw_states) and
# the adjoint kernel always combine in f32.
_SCAN_COMBINE = {"dtype": jnp.float32}


def set_scan_combine_dtype(dtype):
    dtype = jnp.dtype(dtype).type if not isinstance(dtype, type) else dtype
    dtype = jnp.bfloat16 if jnp.dtype(dtype) == jnp.bfloat16 else jnp.float32
    if _SCAN_COMBINE["dtype"] != dtype:
        _SCAN_COMBINE["dtype"] = dtype
        jax.clear_caches()


def _scan_proj_raw(u, dbc, Wdt, bdt, A, chunk: int = 256, interpret: bool = False):
    B, L, D = u.shape
    N = A.shape[1]
    R = Wdt.shape[0]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    inner = _pick_inner(L // chunk, max_inner=16)
    blk = chunk * inner
    grid = (B, L // blk)

    def idx_bt(i, j):
        return (i, j, 0)

    def idx_w(i, j):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_scan_proj_kernel, T=chunk, inner=inner, R=R,
                          combine_dtype=_SCAN_COMBINE["dtype"]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, R + 2 * N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), idx_w, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=interpret,
    )(u, dbc, Wdt, bdt[None], A.T)


def scan_proj_ref(u, dbc, Wdt, bdt, A, D_skip):
    """Pure-JAX reference of the dbc-input scan (backward + CPU path)."""
    f32 = jnp.float32
    R = Wdt.shape[0]
    N = A.shape[1]
    L = u.shape[1]
    delta = jax.nn.softplus(
        jnp.einsum("blr,rd->bld", dbc[..., :R].astype(f32), Wdt.astype(f32))
        + bdt.astype(f32)
    )
    Bc = dbc[..., R : R + N].astype(f32)
    Cc = dbc[..., R + N : R + 2 * N].astype(f32)
    if L % 256 == 0 and L > 4096:
        return ssref.selective_scan_chunked(u, delta, A, Bc, Cc, D_skip, chunk=256)
    return ssref.selective_scan(u, delta, A, Bc, Cc, D_skip)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_proj(u, dbc, Wdt, bdt, A, D_skip, chunk: int = 256):
    """Pallas scan taking the raw x_proj output; reference gradients.

    Computes ``selective_scan(u, softplus(dbc[..,:R] @ Wdt + bdt), A,
    dbc[..,R:R+N], dbc[..,R+N:], D_skip)`` with the dt projection and
    B/C lane extraction inside the kernel.
    """
    interpret = jax.default_backend() != "tpu"
    y = _scan_proj_raw(u, dbc, Wdt, bdt, A, chunk=chunk, interpret=interpret)
    if D_skip is not None:
        y = (y.astype(jnp.float32)
             + u.astype(jnp.float32) * D_skip[None, None]).astype(u.dtype)
    return y


# Backward implementation switch: 'pallas' = the chunked adjoint-scan
# kernel (round 3 — see the backward section at the bottom of this file);
# 'ref' = VJP through the associative-scan reference (the pre-round-3
# path, kept for A/B and as a numerical oracle).
_SCAN_BWD_IMPL = {"impl": "pallas"}


def set_scan_bwd_impl(impl: str):
    """Select the selective-scan backward implementation.

    The choice is read at TRACE time (inside the custom_vjp forward), so
    a grad function jitted BEFORE this call would silently keep its old
    backward — the jit cache is not keyed on this global. To make A/B
    comparisons trustworthy, switching impls clears the jit caches so
    every subsequent grad call retraces under the new choice (ADVICE r3).
    """
    assert impl in ("pallas", "ref"), impl
    if _SCAN_BWD_IMPL["impl"] != impl:
        _SCAN_BWD_IMPL["impl"] = impl
        jax.clear_caches()


def _sp_fwd(u, dbc, Wdt, bdt, A, D_skip, chunk):
    if _SCAN_BWD_IMPL["impl"] != "pallas":
        return (
            selective_scan_proj(u, dbc, Wdt, bdt, A, D_skip, chunk),
            (u, dbc, Wdt, bdt, A, D_skip, None),
        )
    interpret = jax.default_backend() != "tpu"
    y, h_bounds = _scan_proj_raw_states(
        u, dbc, Wdt, bdt, A, chunk=chunk, interpret=interpret
    )
    if D_skip is not None:
        y = (y.astype(jnp.float32)
             + u.astype(jnp.float32) * D_skip[None, None]).astype(u.dtype)
    return y, (u, dbc, Wdt, bdt, A, D_skip, h_bounds)


def _sp_bwd(chunk, res, g):
    u, dbc, Wdt, bdt, A, D_skip, h_bounds = res
    if h_bounds is None:  # reference VJP (scan_bwd_impl='ref')
        _, vjp = jax.vjp(scan_proj_ref, u, dbc, Wdt, bdt, A, D_skip)
        return vjp(g)
    f32 = jnp.float32
    interpret = jax.default_backend() != "tpu"
    du_s, ddt, dB, dC, dA_part = _scan_proj_bwd_raw(
        u, dbc, g, Wdt, bdt, A, h_bounds, chunk=chunk, interpret=interpret
    )
    R = Wdt.shape[0]
    # dt low-rank projection chain — fat MXU matmuls, left to XLA
    raw = (
        jnp.einsum(
            "blr,rd->bld", dbc[..., :R].astype(f32), Wdt.astype(f32),
            preferred_element_type=f32,
        )
        + bdt.astype(f32)
    )
    ddtraw = ddt * jax.nn.sigmoid(raw)  # d softplus
    d_dt_lanes = jnp.einsum(
        "bld,rd->blr", ddtraw, Wdt.astype(f32), preferred_element_type=f32
    )
    ddbc = jnp.concatenate([d_dt_lanes, dB, dC], axis=-1).astype(dbc.dtype)
    dWdt = jnp.einsum(
        "blr,bld->rd", dbc[..., :R].astype(f32), ddtraw,
        preferred_element_type=f32,
    ).astype(Wdt.dtype)
    dbdt = jnp.sum(ddtraw, axis=(0, 1)).astype(bdt.dtype)
    dA = jnp.sum(dA_part, axis=0).T.astype(A.dtype)  # [B,N,D] -> [D,N]
    du = du_s
    if D_skip is not None:
        gy = g.astype(f32)
        du = du + gy * D_skip[None, None].astype(f32)
        dD = jnp.sum(gy * u.astype(f32), axis=(0, 1)).astype(D_skip.dtype)
    else:
        dD = None
    return (du.astype(u.dtype), ddbc, dWdt, dbdt, dA, dD)


selective_scan_proj.defvjp(_sp_fwd, _sp_bwd)


def _scan_gated_kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, z_ref, dskip_ref,
                       wout_ref, o_ref, h_carry, *, T, inner, pre_softplus=False):
    """Scan + epilogue in one pass: y = scan(u, dt, A, B, C); then
    out = ((y + u*D_skip) * silu(z)) @ W_out, written per chunk.

    Fusing the epilogue removes three full [B, L, Di] HBM round-trips
    (scan output, gate product, out-proj input) that XLA otherwise
    materializes between the custom-call and the dense op — measured
    ~0.4 ms/block at the eval point (see PERF.md round-2 log).
    """
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    A = a_ref[:].astype(jnp.float32)  # [N, D]
    N, D = A.shape
    Wout = wout_ref[:]  # [D, Dout] — dot runs in the weight dtype (bf16
    # in the model), matching the unfused `y.astype(dt) @ w_out` numerics
    dskip = dskip_ref[:].astype(jnp.float32)  # [1, D]

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)    # [T, D]
        dt = dt_ref[0, sl, :].astype(jnp.float32)  # [T, D]
        if pre_softplus:
            dt = jax.nn.softplus(dt)
        Bc = b_ref[0, sl, :].astype(jnp.float32)   # [T, N]
        Cc = c_ref[0, sl, :].astype(jnp.float32)   # [T, N]

        dA = jnp.exp(dt[:, None, :] * A[None])        # [T, N, D]
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]   # [T, N, D]
        y, h_new = _chunk_scan(dA, dBx, Cc, h0, T=T, N=N, D=D)
        z = z_ref[0, sl, :].astype(jnp.float32)
        y = (y + u * dskip) * (z * jax.nn.sigmoid(z))
        o_ref[0, sl, :] = jnp.dot(
            y.astype(Wout.dtype), Wout, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def _scan_gated_raw(u, delta, A, Bc, Cc, z, D_skip, Wout, chunk: int = 256,
                    interpret: bool = False, pre_softplus: bool = False):
    B, L, D = u.shape
    N = A.shape[1]
    Dout = Wout.shape[1]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    inner = _pick_inner(L // chunk, max_inner=16)
    blk = chunk * inner
    grid = (B, L // blk)

    def idx_bt(i, j):
        return (i, j, 0)

    def idx_w(i, j):
        return (0, 0)

    out = pl.pallas_call(
        functools.partial(
            _scan_gated_kernel, T=chunk, inner=inner, pre_softplus=pre_softplus
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Dout), idx_w, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, Dout), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Dout), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=interpret,
    )(u, delta, A.T, Bc, Cc, z, D_skip[None], Wout)
    return out


def scan_gated_ref(u, delta, A, Bc, Cc, z, D_skip, Wout, pre_softplus=False):
    """Pure-JAX reference of the gated-epilogue scan (backward + CPU)."""
    f32 = jnp.float32
    d = jax.nn.softplus(delta.astype(f32)) if pre_softplus else delta.astype(f32)
    L = u.shape[1]
    if L % 256 == 0 and L > 4096:
        y = ssref.selective_scan_chunked(u, d, A, Bc, Cc, D_skip, chunk=256)
    else:
        y = ssref.selective_scan(u, d, A, Bc, Cc, D_skip)
    y = y.astype(f32) * jax.nn.silu(z.astype(f32))
    return jnp.einsum(
        "bld,de->ble", y.astype(Wout.dtype), Wout
    ).astype(u.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def scan_gated_fused(u, delta, A, Bc, Cc, z, D_skip, Wout, chunk: int = 256,
                     pre_softplus: bool = False):
    """Pallas scan with the Mamba epilogue fused in; reference gradients.

    Computes ``((scan(u, dt, A, B, C) + u * D_skip) * silu(z)) @ W_out``
    in one kernel. On non-TPU backends runs in interpret mode.
    """
    interpret = jax.default_backend() != "tpu"
    return _scan_gated_raw(u, delta, A, Bc, Cc, z, D_skip, Wout,
                           chunk=chunk, interpret=interpret,
                           pre_softplus=pre_softplus)


def _sg_fwd(u, delta, A, Bc, Cc, z, D_skip, Wout, chunk, pre_softplus):
    return (
        scan_gated_fused(u, delta, A, Bc, Cc, z, D_skip, Wout, chunk, pre_softplus),
        (u, delta, A, Bc, Cc, z, D_skip, Wout),
    )


def _sg_bwd(chunk, pre_softplus, res, g):
    _, vjp = jax.vjp(
        lambda *a: scan_gated_ref(*a, pre_softplus=pre_softplus), *res
    )
    return vjp(g)


scan_gated_fused.defvjp(_sg_fwd, _sg_bwd)


def _pick_inner(n_chunks: int, max_inner: int = 16) -> int:
    """Largest divisor of n_chunks that is <= max_inner (VMEM budget)."""
    for d in range(min(max_inner, n_chunks), 0, -1):
        if n_chunks % d == 0:
            return d
    return 1


def _scan_pallas_raw(u, delta, A, Bc, Cc, chunk: int = 256, interpret: bool = False,
                     pre_softplus: bool = False, flat: bool = False):
    """flat=True selects the [T, N*D] flat-lane kernel — measured SLOWER
    on v5e (7.2 vs 4.2 ms at B8/L25600/Di80/N16): the one-hot MXU
    broadcasts/segment-sums and halved inner blocking cost more than the
    80->128 lane padding they remove. Kept for narrow-D configs and as a
    recorded negative result (PERF.md)."""
    B, L, D = u.shape
    N = A.shape[1]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    flat = flat and (N * D) % 128 == 0
    # flat kernel keeps [T, N*D] f32 temporaries + the one-hot matrices in
    # VMEM; inner=16 blocks are ~200KB over the 16MB scoped budget
    inner = _pick_inner(L // chunk, max_inner=8 if flat else 16)
    blk = chunk * inner
    grid = (B, L // blk)

    def idx_bt(i, j):
        return (i, j, 0)
    if flat:
        kern = functools.partial(
            _scan_chunk_kernel_flat, T=chunk, inner=inner, N=N,
            pre_softplus=pre_softplus,
        )
        a_arg = A.T.reshape(1, N * D)
        a_spec = pl.BlockSpec((1, N * D), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((1, N * D), jnp.float32)
    else:
        kern = functools.partial(
            _scan_chunk_kernel, T=chunk, inner=inner, pre_softplus=pre_softplus
        )
        a_arg = A.T
        a_spec = pl.BlockSpec((N, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((N, D), jnp.float32)

    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            a_spec,
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), u.dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(u, delta, a_arg, Bc, Cc)
    return y


# ---------------------------------------------------------------------------
# Fused Mamba inner pipeline: causal depthwise conv1d -> SiLU -> x/dt
# projections -> softplus -> selective scan -> D-skip -> SiLU(z) gate,
# all in one kernel. The unfused path streams ~6 [B, L, Di]-sized tensors
# through HBM per Mamba (xc, dbc, delta, B, C, scan y); fused, the only
# HBM traffic is xs/z in and y out plus the (tiny) weights.
# ---------------------------------------------------------------------------


def _chunk_scan(dA, dBx, Cc, h0, *, T, N, D, dtype=jnp.float32):
    """Work-efficient two-level inclusive scan over one chunk.

    dA/dBx: [T, N, D]; Cc: [T, N]; h0: [N, D] incoming state (f32).
    Returns (y [T, D] f32, new_h0 [N, D] f32). ``dtype`` selects the
    combine precision (bf16 opt-in; carry and outputs stay f32).
    """
    S = 8 if T % 8 == 0 and T >= 64 else 1
    M = T // S
    a4 = dA.reshape(M, S, N, D)
    b4 = dBx.reshape(M, S, N, D)
    sa = [a4[:, s] for s in range(S)]
    sb = [b4[:, s] for s in range(S)]
    for s in range(1, S):
        sb[s] = sb[s] + sa[s] * sb[s - 1]
        sa[s] = sa[s] * sa[s - 1]
    ta, tb = sa[S - 1], sb[S - 1]
    shift = 1
    while shift < M:
        pa = jnp.concatenate(
            [jnp.ones((shift, N, D), dtype), ta[: M - shift]], axis=0
        )
        pb = jnp.concatenate(
            [jnp.zeros((shift, N, D), dtype), tb[: M - shift]], axis=0
        )
        tb = tb + ta * pb
        ta = ta * pa
        shift *= 2
    h0c = h0.astype(dtype)
    pstate = jnp.concatenate(
        [jnp.broadcast_to(h0c[None], (1, N, D)),
         tb[: M - 1] + ta[: M - 1] * h0c[None]],
        axis=0,
    )
    C4 = Cc.astype(jnp.float32).reshape(M, S, N)
    ys = []
    for s in range(S):
        h_s = sb[s] + sa[s] * pstate
        ys.append(jnp.sum(
            h_s.astype(jnp.float32) * C4[:, s][:, :, None],
            axis=1,
        ))
    y = jnp.stack(ys, axis=1).reshape(T, D)
    new_h = (tb[M - 1] + ta[M - 1] * h0c).astype(jnp.float32)
    return y, new_h


def _mamba_inner_kernel(
    xs_ref, z_ref, wconv_ref, bconv_ref, wx_ref, wdt_ref, bdt_ref, a_ref,
    dskip_ref, y_ref, h_carry, conv_carry, xc_s, delta_s, bc_s, cc_s,
    *, T, inner, R, N, K,
):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)
        conv_carry[:] = jnp.zeros_like(conv_carry)

    A = a_ref[:].astype(jnp.float32)        # [N, Di]
    Wx = wx_ref[:].astype(jnp.float32)      # [Di, R+2N]
    Wdt = wdt_ref[:].astype(jnp.float32)    # [R, Di]
    bdt = bdt_ref[:].astype(jnp.float32)    # [1, Di]
    wconv = wconv_ref[:].astype(jnp.float32)  # [K, Di]
    bconv = bconv_ref[:].astype(jnp.float32)  # [1, Di]
    dskip = dskip_ref[:].astype(jnp.float32)  # [1, Di]
    Di = A.shape[1]
    blk = T * inner

    # --- block-level dense work (one big MXU-friendly pass, not one tiny
    # matmul per chunk — per-chunk matmuls are launch-latency-bound) ----
    xs = xs_ref[0].astype(jnp.float32)  # [blk, Di]

    # causal depthwise conv width K (torch Conv1d groups=Di, left pad),
    # carry = last K-1 rows of the previous block
    xe = jnp.concatenate([conv_carry[:], xs], axis=0)  # [blk+K-1, Di]
    xc = bconv
    for kk in range(K):
        xc = xc + wconv[kk][None] * xe[kk : kk + blk]
    xc = xc * jax.nn.sigmoid(xc)  # silu
    conv_carry[:] = xs[blk - (K - 1) :]

    dbc = jnp.dot(xc, Wx, preferred_element_type=jnp.float32)  # [blk, R+2N]
    delta = jax.nn.softplus(
        jnp.dot(dbc[:, :R], Wdt, preferred_element_type=jnp.float32) + bdt
    )  # [blk, Di]
    # stage block-level results in scratch so the chunk loop can slice
    # them (Mosaic can pl.ds-slice refs, not register values)
    xc_s[:] = xc
    delta_s[:] = delta
    bc_s[:] = dbc[:, R : R + N]
    cc_s[:] = dbc[:, R + N : R + 2 * N]

    # --- sequential scan over chunks (the [T, N, Di] discretization
    # tensors stay chunk-sized to respect VMEM) ---------------------------
    def body(k, h0):
        sl = pl.ds(k * T, T)
        d = delta_s[sl, :]
        x_ = xc_s[sl, :]
        dA = jnp.exp(d[:, None, :] * A[None])              # [T, N, Di]
        dBx = bc_s[sl, :][:, :, None] * (d * x_)[:, None, :]
        y, h_new = _chunk_scan(dA, dBx, cc_s[sl, :], h0, T=T, N=N, D=Di)
        z = z_ref[0, sl, :].astype(jnp.float32)
        y = y + x_ * dskip
        y = y * (z * jax.nn.sigmoid(z))
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def mamba_inner_ref(xs, z, wconv, bconv, Wx, Wdt, bdt, A, D_skip):
    """Pure-JAX reference of the fused pipeline (backward path + CPU).

    xs, z: [B, L, Di]; wconv [K, Di]; Wx [Di, R+2N]; Wdt [R, Di];
    A [Di, N] (negative); D_skip [Di]. Returns [B, L, Di] in xs.dtype.
    """
    from lfsr_tpu.ops import selective_scan as ssr

    K = wconv.shape[0]
    R = Wdt.shape[0]
    N = A.shape[1]
    L = xs.shape[1]
    f32 = jnp.float32
    xp = jnp.pad(xs.astype(f32), ((0, 0), (K - 1, 0), (0, 0)))
    xc = jax.lax.conv_general_dilated(
        xp, wconv.astype(f32)[:, None, :], (1,), "VALID",
        dimension_numbers=("NLC", "LIO", "NLC"),
        feature_group_count=xs.shape[-1],
    ) + bconv.astype(f32)
    xc = jax.nn.silu(xc)
    dbc = jnp.einsum("bld,dk->blk", xc, Wx.astype(f32))
    delta = jax.nn.softplus(
        jnp.einsum("blr,rd->bld", dbc[..., :R], Wdt.astype(f32)) + bdt.astype(f32)
    )
    Bc, Cc = dbc[..., R : R + N], dbc[..., R + N : R + 2 * N]
    if L % 256 == 0 and L > 4096:
        y = ssr.selective_scan_chunked(xc, delta, A, Bc, Cc, D_skip, chunk=256)
    else:
        y = ssr.selective_scan(xc, delta, A, Bc, Cc, D_skip)
    return (y.astype(f32) * jax.nn.silu(z.astype(f32))).astype(xs.dtype)


def _mamba_fused_raw(xs, z, wconv, bconv, Wx, Wdt, bdt, A, D_skip,
                     chunk: int = 128, interpret: bool = False):
    B, L, Di = xs.shape
    N = A.shape[1]
    K = wconv.shape[0]
    R = Wdt.shape[0]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0"
    inner = _pick_inner(L // chunk)
    blk = chunk * inner
    grid = (B, L // blk)

    def idx_bt(i, j):
        return (i, j, 0)

    def idx_w(i, j):
        return (0, 0)

    wspec = lambda shape: pl.BlockSpec(shape, idx_w, memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(
            _mamba_inner_kernel, T=chunk, inner=inner, R=R, N=N, K=K
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
            wspec((K, Di)),
            wspec((1, Di)),
            wspec((Di, R + 2 * N)),
            wspec((R, Di)),
            wspec((1, Di)),
            wspec((N, Di)),
            wspec((1, Di)),
        ],
        out_specs=pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Di), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, Di), jnp.float32),
            pltpu.VMEM((K - 1, Di), jnp.float32),
            pltpu.VMEM((blk, Di), jnp.float32),  # xc
            pltpu.VMEM((blk, Di), jnp.float32),  # delta
            pltpu.VMEM((blk, N), jnp.float32),   # B
            pltpu.VMEM((blk, N), jnp.float32),   # C
        ],
        interpret=interpret,
    )(xs, z, wconv, bconv[None], Wx, Wdt, bdt[None], A.T, D_skip[None])
    return y


@jax.custom_vjp
def mamba_inner_fused(xs, z, wconv, bconv, Wx, Wdt, bdt, A, D_skip):
    """Fused Mamba inner pipeline; associative-scan-reference gradients."""
    interpret = jax.default_backend() != "tpu"
    return _mamba_fused_raw(
        xs, z, wconv, bconv, Wx, Wdt, bdt, A, D_skip, interpret=interpret
    )


def _mi_fwd(*args):
    return mamba_inner_fused(*args), args


def _mi_bwd(res, g):
    _, vjp = jax.vjp(mamba_inner_ref, *res)
    return vjp(g)


mamba_inner_fused.defvjp(_mi_fwd, _mi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def selective_scan_fused(u, delta, A, Bc, Cc, D_skip, chunk: int = 256,
                         pre_softplus: bool = False):
    """Pallas selective scan with associative-scan gradients.

    Same contract as lfsr_tpu.ops.selective_scan.selective_scan. On
    non-TPU backends runs the kernel in interpret mode. With
    ``pre_softplus`` the delta argument is pre-activation (so it can
    stream in bf16) and softplus runs in f32 inside the kernel.
    """
    interpret = jax.default_backend() != "tpu"
    y = _scan_pallas_raw(u, delta, A, Bc, Cc, interpret=interpret, chunk=chunk,
                         pre_softplus=pre_softplus)
    if D_skip is not None:
        y = (y.astype(jnp.float32) + u.astype(jnp.float32) * D_skip[None, None]).astype(u.dtype)
    return y


def _fwd(u, delta, A, Bc, Cc, D_skip, chunk, pre_softplus):
    return (
        selective_scan_fused(u, delta, A, Bc, Cc, D_skip, chunk, pre_softplus),
        (u, delta, A, Bc, Cc, D_skip),
    )


def _bwd(chunk, pre_softplus, res, g):
    # Gradients via the chunked lax.scan implementation: its VJP stores
    # per-chunk boundary states instead of the O(L) [B,L,D,N] tensors the
    # fully-parallel scan would (which OOMs at the L=25600 eval point).
    u, delta, A, Bc, Cc, D_skip = res

    def ref(u_, delta_, A_, Bc_, Cc_, D_):
        d = jax.nn.softplus(delta_.astype(jnp.float32)) if pre_softplus else delta_
        return ssref.selective_scan_chunked(u_, d, A_, Bc_, Cc_, D_, chunk=chunk)

    _, vjp = jax.vjp(ref, u, delta, A, Bc, Cc, D_skip)
    return vjp(g)


selective_scan_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernel for selective_scan_proj (round 3).
#
# The associative-scan reference VJP dominated the train step: 145 ms per
# Mamba at B8/L25600 (PERF.md scan table) x 12 blocks ~= 1.7 s of the
# 2.34 s step. The adjoint recurrence is itself a selective scan run in
# REVERSE time —
#     lam_t = C_t (x) dy_t + dA_{t+1} * lam_{t+1}
# — so the same chunked VMEM-carry machinery applies: the forward kernel
# additionally saves the [N, D] state at each grid-block boundary (tiny:
# [B, L/blk, N, D]), and the backward grid walks blocks in reverse,
# recomputing in-chunk forward states from the saved boundary (pass 1)
# and running the reverse adjoint scan + all gradient contractions in
# VMEM (pass 2). This mirrors mamba_ssm's CUDA backward
# (selective_scan_bwd_kernel.cuh) structure, re-derived for the TPU
# grid/VMEM model. Gradients that are fat MXU matmuls (the dt low-rank
# projection chain) stay OUTSIDE in XLA.
# ---------------------------------------------------------------------------


def _chunk_scan_h(dA, dBx, h0, *, T, N, D):
    """State-only chunk update: the [N, D] state after the chunk."""
    S = 8 if T % 8 == 0 and T >= 64 else 1
    M = T // S
    a4 = dA.reshape(M, S, N, D)
    b4 = dBx.reshape(M, S, N, D)
    sa = [a4[:, s] for s in range(S)]
    sb = [b4[:, s] for s in range(S)]
    for s in range(1, S):
        sb[s] = sb[s] + sa[s] * sb[s - 1]
        sa[s] = sa[s] * sa[s - 1]
    ta, tb = sa[S - 1], sb[S - 1]
    shift = 1
    while shift < M:
        pa = jnp.concatenate(
            [jnp.ones((shift, N, D), jnp.float32), ta[: M - shift]], axis=0
        )
        pb = jnp.concatenate(
            [jnp.zeros((shift, N, D), jnp.float32), tb[: M - shift]], axis=0
        )
        tb = tb + ta * pb
        ta = ta * pa
        shift *= 2
    return tb[M - 1] + ta[M - 1] * h0


def _chunk_scan_states(dA, dBx, h0, *, T, N, D):
    """Like _chunk_scan but returns ALL per-step states [T, N, D]
    (needed by the backward's dC / d-delta / dA contractions)."""
    S = 8 if T % 8 == 0 and T >= 64 else 1
    M = T // S
    a4 = dA.reshape(M, S, N, D)
    b4 = dBx.reshape(M, S, N, D)
    sa = [a4[:, s] for s in range(S)]
    sb = [b4[:, s] for s in range(S)]
    for s in range(1, S):
        sb[s] = sb[s] + sa[s] * sb[s - 1]
        sa[s] = sa[s] * sa[s - 1]
    ta, tb = sa[S - 1], sb[S - 1]
    shift = 1
    while shift < M:
        pa = jnp.concatenate(
            [jnp.ones((shift, N, D), jnp.float32), ta[: M - shift]], axis=0
        )
        pb = jnp.concatenate(
            [jnp.zeros((shift, N, D), jnp.float32), tb[: M - shift]], axis=0
        )
        tb = tb + ta * pb
        ta = ta * pa
        shift *= 2
    pstate = jnp.concatenate(
        [jnp.broadcast_to(h0[None], (1, N, D)), tb[: M - 1] + ta[: M - 1] * h0[None]],
        axis=0,
    )
    h_all = jnp.stack(
        [sb[s] + sa[s] * pstate for s in range(S)], axis=1
    ).reshape(T, N, D)
    return h_all, tb[M - 1] + ta[M - 1] * h0


def _chunk_scan_rev(m, g, *, T, N, D):
    """Reverse inclusive scan: lam_t = g_t + m_t * lam_{t+1}, lam_T = 0
    (the cross-chunk seed is pre-folded into g_{T-1} by the caller).
    Returns (lam [T, N, D], lam_0 [N, D]). Mirrors _chunk_scan with the
    fold direction and Hillis-Steele concats flipped — no data reversal
    needed in VMEM."""
    S = 8 if T % 8 == 0 and T >= 64 else 1
    M = T // S
    m4 = m.reshape(M, S, N, D)
    g4 = g.reshape(M, S, N, D)
    sa = [m4[:, s] for s in range(S)]
    sb = [g4[:, s] for s in range(S)]
    for s in range(S - 2, -1, -1):
        sb[s] = sb[s] + sa[s] * sb[s + 1]
        sa[s] = sa[s] * sa[s + 1]
    ta, tb = sa[0], sb[0]
    shift = 1
    while shift < M:
        pa = jnp.concatenate(
            [ta[shift:], jnp.ones((shift, N, D), jnp.float32)], axis=0
        )
        pb = jnp.concatenate(
            [tb[shift:], jnp.zeros((shift, N, D), jnp.float32)], axis=0
        )
        tb = tb + ta * pb
        ta = ta * pa
        shift *= 2
    pstate = jnp.concatenate([tb[1:], jnp.zeros((1, N, D), jnp.float32)], axis=0)
    lam = jnp.stack(
        [sb[s] + sa[s] * pstate for s in range(S)], axis=1
    ).reshape(T, N, D)
    return lam, tb[0]


def _scan_proj_states_kernel(u_ref, dbc_ref, wdt_ref, bdt_ref, a_ref,
                             y_ref, hb_ref, h_carry, *, T, inner, R):
    """_scan_proj_kernel that also records the block-start state (the
    backward's recompute seed)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    hb_ref[0, 0] = h_carry[:]  # state BEFORE this block

    A = a_ref[:].astype(jnp.float32)  # [N, D]
    N, D = A.shape
    Wdt = wdt_ref[:].astype(jnp.float32)
    bdt = bdt_ref[:].astype(jnp.float32)

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)
        dbc = dbc_ref[0, sl, :].astype(jnp.float32)
        dt = jax.nn.softplus(
            jnp.dot(dbc[:, :R], Wdt, preferred_element_type=jnp.float32) + bdt
        )
        Bc = dbc[:, R : R + N]
        Cc = dbc[:, R + N : R + 2 * N]
        dA = jnp.exp(dt[:, None, :] * A[None])
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]
        y, h_new = _chunk_scan(dA, dBx, Cc, h0, T=T, N=N, D=D)
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return h_new

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def _scan_proj_raw_states(u, dbc, Wdt, bdt, A, chunk: int = 256,
                          interpret: bool = False):
    """Forward kernel emitting (y, h_bounds [B, n_blocks, N, D])."""
    B, L, D = u.shape
    N = A.shape[1]
    R = Wdt.shape[0]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    inner = _pick_inner(L // chunk, max_inner=16)
    blk = chunk * inner
    n_blocks = L // blk
    grid = (B, n_blocks)

    def idx_bt(i, j):
        return (i, j, 0)

    def idx_w(i, j):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_scan_proj_states_kernel, T=chunk, inner=inner, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, R + 2 * N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), idx_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, N, D), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), u.dtype),
            jax.ShapeDtypeStruct((B, n_blocks, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=interpret,
    )(u, dbc, Wdt, bdt[None], A.T)


def _scan_proj_bwd_kernel(u_ref, dbc_ref, dy_ref, wdt_ref, bdt_ref, a_ref,
                          hb_ref, du_ref, ddt_ref, db_ref, dc_ref, da_ref,
                          mu_carry, *, T, inner, R, n_blocks):
    """One reversed (batch row, block) grid step of the adjoint scan.

    Both chunk walks are unrolled at Python level (``inner`` is static):
    Mosaic cannot lower dynamic-index scratch access inside fori, and
    unrolling lets the chunk-start states live as SSA values instead of a
    scratch buffer."""
    j = pl.program_id(1)

    A = a_ref[:].astype(jnp.float32)  # [N, D]
    N, D = A.shape
    Wdt = wdt_ref[:].astype(jnp.float32)
    bdt = bdt_ref[:].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        mu_carry[:] = jnp.zeros_like(mu_carry)
        da_ref[:] = jnp.zeros_like(da_ref)

    def coeffs(k):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)
        dbc = dbc_ref[0, sl, :].astype(jnp.float32)
        dt = jax.nn.softplus(
            jnp.dot(dbc[:, :R], Wdt, preferred_element_type=jnp.float32) + bdt
        )
        Bc = dbc[:, R : R + N]
        Cc = dbc[:, R + N : R + 2 * N]
        dA = jnp.exp(dt[:, None, :] * A[None])
        return u, dt, Bc, Cc, dA

    # pass 1: forward state recompute — chunk-start states as values
    hs = []
    h = hb_ref[0, 0].astype(jnp.float32)
    for k in range(inner):
        hs.append(h)
        u, dt, Bc, _, dA = coeffs(k)
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]
        h = _chunk_scan_h(dA, dBx, h, T=T, N=N, D=D)

    # pass 2: reverse adjoint scan + gradient contractions, chunk by chunk
    mu = mu_carry[:]
    da_acc = jnp.zeros((N, D), jnp.float32)
    for k in range(inner - 1, -1, -1):
        sl = pl.ds(k * T, T)
        u, dt, Bc, Cc, dA = coeffs(k)
        dy = dy_ref[0, sl, :].astype(jnp.float32)
        h0c = hs[k]
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]
        h_all, _ = _chunk_scan_states(dA, dBx, h0c, T=T, N=N, D=D)
        xprev = jnp.concatenate([h0c[None], h_all[: T - 1]], axis=0)
        g = Cc[:, :, None] * dy[:, None, :]
        # NOTE: positive indices only — g[-1] lowers to dynamic_slice,
        # which Mosaic cannot lower inside a TC kernel
        g = jnp.concatenate([g[: T - 1], (g[T - 1] + mu)[None]], axis=0)
        m = jnp.concatenate(
            [dA[1:], jnp.ones((1,) + dA.shape[1:], jnp.float32)], axis=0
        )
        lam, lam0 = _chunk_scan_rev(m, g, T=T, N=N, D=D)

        s1 = jnp.sum(lam * Bc[:, :, None], axis=1)        # [T, D]
        w = lam * dA * xprev                              # [T, N, D]
        ddt = jnp.sum(w * A[None], axis=1) + s1 * u       # [T, D]
        du_ref[0, sl, :] = (s1 * dt).astype(du_ref.dtype)
        ddt_ref[0, sl, :] = ddt.astype(ddt_ref.dtype)
        db_ref[0, sl, :] = jnp.sum(
            lam * (dt * u)[:, None, :], axis=2
        ).astype(db_ref.dtype)
        dc_ref[0, sl, :] = jnp.sum(
            h_all * dy[:, None, :], axis=2
        ).astype(dc_ref.dtype)
        da_acc = da_acc + jnp.sum(w * dt[:, None, :], axis=0)  # [N, D]
        mu = dA[0] * lam0

    da_ref[:] += da_acc
    mu_carry[:] = mu


def _scan_proj_bwd_raw(u, dbc, dy, Wdt, bdt, A, h_bounds, chunk: int = 256,
                       interpret: bool = False):
    """Pallas adjoint: returns (du_scan, ddt, dB, dC, dA_part[B,N,D]) —
    all per-step grads f32, dt-projection chain left to XLA outside."""
    B, L, D = u.shape
    N = A.shape[1]
    R = Wdt.shape[0]
    chunk = min(chunk, L)
    assert L % chunk == 0
    inner = _pick_inner(L // chunk, max_inner=16)
    blk = chunk * inner
    n_blocks = L // blk
    assert h_bounds.shape == (B, n_blocks, N, D), h_bounds.shape
    grid = (B, n_blocks)

    def idx_rev(i, j):
        return (i, n_blocks - 1 - j, 0)

    def idx_w(i, j):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(
            _scan_proj_bwd_kernel, T=chunk, inner=inner, R=R, n_blocks=n_blocks
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, R + 2 * N), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, N, D),
                lambda i, j: (i, n_blocks - 1 - j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, N, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            jax.ShapeDtypeStruct((B, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(u, dbc, dy, Wdt, bdt[None], A.T, h_bounds)
