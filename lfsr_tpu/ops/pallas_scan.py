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


def _scan_chunk_kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_carry):
    """One (batch row, L-chunk) grid step."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    u = u_ref[0].astype(jnp.float32)      # [T, D]
    dt = dt_ref[0].astype(jnp.float32)    # [T, D]
    A = a_ref[:].astype(jnp.float32)      # [N, D] (pre-transposed by caller)
    Bc = b_ref[0].astype(jnp.float32)     # [T, N]
    Cc = c_ref[0].astype(jnp.float32)     # [T, N]
    T, D = u.shape
    N = A.shape[0]

    # ZOH discretization in [T, N, D] layout: D rides the 128-lane axis and
    # the scan shifts run along the untiled leading T axis. Mosaic cannot
    # shape-cast (T, D, N) -> (T, D*N), so everything stays 3-D.
    dA = jnp.exp(dt[:, None, :] * A[None])            # [T, N, D]
    dBx = Bc[:, :, None] * (dt * u)[:, None, :]       # [T, N, D]

    # Hillis-Steele inclusive scan over the chunk (log2(T) passes):
    # (a, b) o (a', b') = (a*a', a'*b + b')
    a, b = dA, dBx
    shift = 1
    while shift < T:
        a_prev = jnp.concatenate(
            [jnp.ones((shift, N, D), jnp.float32), a[: T - shift]], axis=0
        )
        b_prev = jnp.concatenate(
            [jnp.zeros((shift, N, D), jnp.float32), b[: T - shift]], axis=0
        )
        b = b + a * b_prev
        a = a * a_prev
        shift *= 2

    # inject the carry from previous chunks: h[t] = b[t] + aprod[t] * h0
    h = b + a * h_carry[:][None]
    # static slice (negative indexing lowers to unsupported dynamic_slice)
    h_carry[:] = h[T - 1]

    y = jnp.sum(h * Cc[:, :, None], axis=1)  # [T, D]
    y_ref[0] = y.astype(y_ref.dtype)


def _scan_pallas_raw(u, delta, A, Bc, Cc, chunk: int = 128, interpret: bool = False):
    B, L, D = u.shape
    N = A.shape[1]
    assert L % chunk == 0, f"L={L} % chunk={chunk} != 0 (pad upstream)"
    grid = (B, L // chunk)

    def idx_bt(i, j):
        return (i, j, 0)

    y = pl.pallas_call(
        _scan_chunk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, D), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, N), idx_bt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, D), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=interpret,
    )(u, delta, A.T, Bc, Cc)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_fused(u, delta, A, Bc, Cc, D_skip, chunk: int = 128):
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
