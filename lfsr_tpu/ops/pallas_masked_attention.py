"""Fused Pallas TPU kernel for short-sequence masked multi-head attention.

Why a kernel: EPIT's EPI-axis transformers (models/epit.py, reference
EPIT.py:74-128) run banded attention over L = A*h = 160 tokens batched
over B' = mb*A*w = 1280 sequences. Under XLA the [B', heads, L, L] score
and softmax tensors (~0.5 GB each per pass at mb=8) stream through HBM —
10 passes per forward make the model ~5% MFU. Each sequence's whole
attention fits in VMEM, so this kernel computes scores -> masked softmax
-> weighted values for a block of sequences without ever materializing
scores in HBM.

MXU-friendly head handling (same trick as pallas_attention.py): per-head
scores via a full-D contraction against head-masked stacked K/V

    K_big[b, h*L + j, d] = K[b, j, d] * (d in head h)
    S_big = Q . K_big^T          # [nb, L, heads*L], K-dim = D

so no matmul contracts over head_dim=16. The heads-fold FLOP inflation
is paid on the MXU where these shapes run near peak; the HBM traffic it
removes is the measured bottleneck.

The additive mask is shared across heads and tiled to [L, heads*L]
outside the kernel (static per patch geometry — EPIT.py gen_mask).

Gradients: custom_vjp differentiating the pure-JAX mirror
(``masked_mha_ref``), so training matches the reference math exactly.
Non-TPU backends run the kernel in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _masked_mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads: int):
    f32 = jnp.float32
    q = q_ref[:].astype(f32)          # [nb, L, D]
    k = k_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    nb, L, D = q.shape
    hd = D // heads
    q = q * (1.0 / (hd ** 0.5))

    # head-masked stacked K/V: [nb, heads*L, D]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, heads * L, D), 2)
    hrow = jax.lax.broadcasted_iota(jnp.int32, (1, heads * L, D), 1) // L
    hmask = (lane // hd == hrow).astype(f32)
    k_big = jnp.concatenate([k] * heads, axis=1) * hmask
    v_big = jnp.concatenate([v] * heads, axis=1) * hmask

    s_big = jax.lax.dot_general(
        q, k_big,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # [nb, L, heads*L]
    s_big = s_big + bias_ref[:].astype(f32)[None]

    parts = []
    for h in range(heads):
        s_h = s_big[:, :, h * L : (h + 1) * L]
        s_h = s_h - jnp.max(s_h, axis=-1, keepdims=True)
        e = jnp.exp(s_h)
        parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
    p_big = jnp.concatenate(parts, axis=-1)

    o = jax.lax.dot_general(
        p_big, v_big,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # [nb, L, D]
    o_ref[:] = o.astype(o_ref.dtype)


def _masked_mha_raw(q, k, v, bias_big, *, heads: int, interpret: bool,
                    block_b: int = 4):
    B, L, D = q.shape
    nb = block_b if B % block_b == 0 else 1
    grid = (B // nb,)
    spec = pl.BlockSpec((nb, L, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_mha_kernel, heads=heads),
        grid=grid,
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((L, heads * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v, bias_big)


def masked_mha_ref(q, k, v, mask, *, heads: int):
    """Pure-JAX mirror (oracle + backward): flax dot_product_attention
    semantics over channel-contiguous heads. q/k/v [B, L, D], additive
    mask [L, L] shared across heads. Returns [B, L, D]."""
    B, L, D = q.shape
    hd = D // heads
    f32 = jnp.float32
    qh = q.astype(f32).reshape(B, L, heads, hd) * (1.0 / (hd ** 0.5))
    kh = k.astype(f32).reshape(B, L, heads, hd)
    vh = v.astype(f32).reshape(B, L, heads, hd)
    s = jnp.einsum("bihd,bjhd->bhij", qh, kh) + mask.astype(f32)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", p, vh).reshape(B, L, D)
    return o.astype(q.dtype)


def supported(L: int, D: int, heads: int) -> bool:
    """Geometries validated for the fused path: lane-aligned D, 8-aligned
    sequence, channel-partitioned heads."""
    return D % 128 == 0 and L % 8 == 0 and D % heads == 0 and L * heads <= 4096


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_mha_fused(q, k, v, mask, heads: int = 8):
    """Fused masked MHA: same contract as :func:`masked_mha_ref`."""
    interpret = jax.default_backend() != "tpu"
    L = q.shape[1]
    bias_big = jnp.tile(mask, (1, heads))
    return _masked_mha_raw(q, k, v, bias_big, heads=heads,
                           interpret=interpret)


def _fwd(q, k, v, mask, heads):
    return masked_mha_fused(q, k, v, mask, heads), (q, k, v, mask)


def _bwd(heads, res, g):
    q, k, v, mask = res
    ref = functools.partial(masked_mha_ref, heads=heads)
    _, vjp = jax.vjp(ref, q, k, v, mask)
    return vjp(g)


masked_mha_fused.defvjp(_fwd, _bwd)
