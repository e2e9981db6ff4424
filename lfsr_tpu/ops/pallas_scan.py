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


def _scan_chunk_kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_carry, *, T, inner):
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

    S = 8 if T % 8 == 0 and T >= 64 else 1  # intra-segment length
    M = T // S

    def body(k, h0):
        sl = pl.ds(k * T, T)
        u = u_ref[0, sl, :].astype(jnp.float32)    # [T, D]
        dt = dt_ref[0, sl, :].astype(jnp.float32)  # [T, D]
        Bc = b_ref[0, sl, :].astype(jnp.float32)   # [T, N]
        Cc = c_ref[0, sl, :].astype(jnp.float32)   # [T, N]

        # ZOH discretization in [T, N, D] layout: D rides the 128-lane
        # axis and the scan runs along the untiled leading T axis.
        dA = jnp.exp(dt[:, None, :] * A[None])        # [T, N, D]
        dBx = Bc[:, :, None] * (dt * u)[:, None, :]   # [T, N, D]

        # Work-efficient two-level scan. Hillis-Steele over the whole
        # chunk does O(T log T) combines; splitting the chunk into M
        # segments of length S and scanning segments sequentially (the
        # combines vectorize across M) cuts the combine work ~3x — the
        # kernel is VPU-compute-bound at L=25600, so this is wall time.
        a4 = dA.reshape(M, S, N, D)
        b4 = dBx.reshape(M, S, N, D)
        sa = [a4[:, s] for s in range(S)]  # S x [M, N, D]
        sb = [b4[:, s] for s in range(S)]
        for s in range(1, S):
            sb[s] = sb[s] + sa[s] * sb[s - 1]
            sa[s] = sa[s] * sa[s - 1]

        # inter-segment inclusive scan over M (log2(M) passes on 1/S of
        # the data): (a, b) o (a', b') = (a*a', a'*b + b')
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

        # exclusive prefix state per segment, seeded with the carry
        pstate = jnp.concatenate(
            [jnp.broadcast_to(h0[None], (1, N, D)), tb[: M - 1] + ta[: M - 1] * h0[None]],
            axis=0,
        )  # [M, N, D]

        C4 = Cc.reshape(M, S, N)
        ys = []
        for s in range(S):
            h_s = sb[s] + sa[s] * pstate               # [M, N, D]
            ys.append(jnp.sum(h_s * C4[:, s][:, :, None], axis=1))  # [M, D]
        y = jnp.stack(ys, axis=1).reshape(T, D)
        y_ref[0, sl, :] = y.astype(y_ref.dtype)
        return tb[M - 1] + ta[M - 1] * h0  # state after this chunk

    h_carry[:] = jax.lax.fori_loop(0, inner, body, h_carry[:])


def _pick_inner(n_chunks: int, max_inner: int = 16) -> int:
    """Largest divisor of n_chunks that is <= max_inner (VMEM budget)."""
    for d in range(min(max_inner, n_chunks), 0, -1):
        if n_chunks % d == 0:
            return d
    return 1


def _scan_pallas_raw(u, delta, A, Bc, Cc, chunk: int = 256, interpret: bool = False):
    B, L, D = u.shape
    N = A.shape[1]
    chunk = min(chunk, L)
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    inner = _pick_inner(L // chunk)
    blk = chunk * inner
    grid = (B, L // blk)

    def idx_bt(i, j):
        return (i, j, 0)

    y = pl.pallas_call(
        functools.partial(_scan_chunk_kernel, T=chunk, inner=inner),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=interpret,
    )(u, delta, A.T, Bc, Cc)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_fused(u, delta, A, Bc, Cc, D_skip, chunk: int = 256):
    """Pallas selective scan with associative-scan gradients.

    Same contract as lfsr_tpu.ops.selective_scan.selective_scan. On
    non-TPU backends runs the kernel in interpret mode.
    """
    interpret = jax.default_backend() != "tpu"
    y = _scan_pallas_raw(u, delta, A, Bc, Cc, interpret=interpret, chunk=chunk)
    if D_skip is not None:
        y = (y.astype(jnp.float32) + u.astype(jnp.float32) * D_skip[None, None]).astype(u.dtype)
    return y


def _fwd(u, delta, A, Bc, Cc, D_skip, chunk):
    return selective_scan_fused(u, delta, A, Bc, Cc, D_skip, chunk), (u, delta, A, Bc, Cc, D_skip)


def _bwd(chunk, res, g):
    # Gradients via the chunked lax.scan implementation: its VJP stores
    # per-chunk boundary states instead of the O(L) [B,L,D,N] tensors the
    # fully-parallel scan would (which OOMs at the L=25600 eval point).
    u, delta, A, Bc, Cc, D_skip = res
    _, vjp = jax.vjp(
        lambda *args: ssref.selective_scan_chunked(*args, chunk=chunk),
        u, delta, A, Bc, Cc, D_skip,
    )
    return vjp(g)


selective_scan_fused.defvjp(_fwd, _bwd)
