"""Selective state-space scan (Mamba) — TPU-native formulations.

The reference depends on the external ``mamba_ssm`` CUDA selective-scan
kernel (hard import in MyEfficientLFNetV6_4.py:35-49, V8.py:37-51). A CUDA
recurrence is the wrong shape for a TPU; the recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is a first-order linear scan with elementwise (diagonal-A) coefficients,
which is **associative**: (a1,b1) o (a2,b2) = (a1*a2, a2*b1 + b2). So here
it runs as a log-depth ``jax.lax.associative_scan`` over the sequence —
fully parallel across B, D, N and pipelined on the VPU — instead of a
sequential loop.

Two implementations:
- ``selective_scan``       — associative_scan (default; differentiable).
- ``selective_scan_chunked`` — lax.scan over chunks with an in-chunk
  associative scan, bounding the O(B*L*D*N) intermediate to one chunk;
  used when L*D*N would blow past VMEM-friendly sizes.

Both are validated against a sequential lax.scan oracle in
tests/test_selective_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _scan_op(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def selective_scan(
    u: jnp.ndarray,      # [B, L, D]  input sequence
    delta: jnp.ndarray,  # [B, L, D]  positive step sizes (post-softplus)
    A: jnp.ndarray,      # [D, N]     diagonal state matrix (negative real)
    Bc: jnp.ndarray,     # [B, L, N]  input->state coefficients
    Cc: jnp.ndarray,     # [B, L, N]  state->output coefficients
    D: jnp.ndarray | None = None,  # [D] skip
) -> jnp.ndarray:
    """Parallel selective scan; returns y [B, L, D]. Computes in float32."""
    f32 = jnp.float32
    u32, d32 = u.astype(f32), delta.astype(f32)
    # ZOH discretization: abar = exp(dt*A), bbar*x = dt * B_t * x_t
    dA = jnp.exp(d32[..., :, None] * A.astype(f32)[None, None])      # [B,L,D,N]
    dBx = (d32 * u32)[..., :, None] * Bc.astype(f32)[:, :, None, :]  # [B,L,D,N]
    _, h = jax.lax.associative_scan(_scan_op, (dA, dBx), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cc.astype(f32))
    if D is not None:
        y = y + u32 * D.astype(f32)[None, None]
    return y.astype(u.dtype)


def selective_scan_chunked(
    u, delta, A, Bc, Cc, D=None, chunk: int = 256
) -> jnp.ndarray:
    """Chunked scan: sequential over L/chunk, parallel inside each chunk.

    Carries only the [B, D, N] boundary state between chunks, so the
    [chunk, D, N] intermediates stay VMEM-sized. L must be divisible by
    ``chunk`` (callers pad; LF rasters are h*w with static shapes).
    """
    f32 = jnp.float32
    B, L, Dm = u.shape
    N = A.shape[1]
    assert L % chunk == 0, f"L={L} not divisible by chunk={chunk}"
    nchunks = L // chunk

    u32 = u.astype(f32).reshape(B, nchunks, chunk, Dm)
    d32 = delta.astype(f32).reshape(B, nchunks, chunk, Dm)
    Bc32 = Bc.astype(f32).reshape(B, nchunks, chunk, N)
    Cc32 = Cc.astype(f32).reshape(B, nchunks, chunk, N)
    A32 = A.astype(f32)

    # remat: without it the scan VJP saves the associative-scan's
    # O(log chunk) [B, chunk, D, N] internals for EVERY chunk
    # (~200 MB x several per Mamba at the L=25600/batch-8 train point —
    # HBM-OOM on one v5e); recomputing them in backward costs one extra
    # forward of the chunk body and keeps only the [B, D, N] carries.
    @jax.checkpoint
    def step(h0, inputs):
        uc, dc, bc, cc = inputs  # [B, chunk, ...]
        dA = jnp.exp(dc[..., :, None] * A32[None, None])
        dBx = (dc * uc)[..., :, None] * bc[:, :, None, :]
        aprod, h = jax.lax.associative_scan(_scan_op, (dA, dBx), axis=1)
        h = h + aprod * h0[:, None]  # inject carry into every position
        yc = jnp.einsum("bldn,bln->bld", h, cc)
        return h[:, -1], yc

    inputs = tuple(jnp.moveaxis(t, 1, 0) for t in (u32, d32, Bc32, Cc32))
    h0 = jnp.zeros((B, Dm, N), f32)
    _, ys = jax.lax.scan(step, h0, inputs)
    y = jnp.moveaxis(ys, 0, 1).reshape(B, L, Dm)
    if D is not None:
        y = y + u.astype(f32) * D.astype(f32)[None, None]
    return y.astype(u.dtype)


def selective_scan_sequential(u, delta, A, Bc, Cc, D=None):
    """Sequential lax.scan oracle (test reference only — O(L) depth)."""
    f32 = jnp.float32
    B, L, Dm = u.shape
    A32 = A.astype(f32)

    def step(h, inputs):
        ut, dt_, bt, ct = inputs
        dA = jnp.exp(dt_[..., None] * A32[None])
        h = dA * h + (dt_ * ut)[..., None] * bt[:, None, :]
        y = jnp.einsum("bdn,bn->bd", h, ct)
        return h, y

    inputs = tuple(
        jnp.moveaxis(t.astype(f32), 1, 0) for t in (u, delta, Bc, Cc)
    )
    h0 = jnp.zeros((B, Dm, A.shape[1]), f32)
    _, ys = jax.lax.scan(step, h0, inputs)
    y = jnp.moveaxis(ys, 0, 1)
    if D is not None:
        y = y + u.astype(f32) * D.astype(f32)[None, None]
    return y.astype(u.dtype)
