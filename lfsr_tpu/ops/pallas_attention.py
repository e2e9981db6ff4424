"""Fused Pallas TPU kernel for Swin-style windowed multi-head attention.

Why a kernel: the XLA path for LFMambaX's WindowAttention (8x8 windows,
C=64, 4 heads) measures 5.5 ms at [8,160,160,64] while its parts sum to
~2.1 ms — the window partition/unpartition relayouts, the head_dim=16
batched matmuls (12.5% lane utilization), and the [3200,4,64,64] f32
score tensors streaming through HBM dominate. This kernel runs the whole
block — LayerNorm -> qkv projection -> per-window MHA with relative
position bias -> output projection -> scaled residual — over one
[ws, W, C] row of windows held in VMEM.

MXU-friendly head handling: instead of slicing [.., heads, 16] tensors
(16-lane layouts), the per-head scores are computed with a full-C
contraction against a head-masked stacked K:

    K_big[w, h*T + j, c] = K[w, j, c] * (c in head h)
    S_big = Q . K_big^T        # [nw, T, heads*T], K-dim = C = 64

and the attention-weighted values with the matching stacked V, so every
matmul contracts over >=64 elements and no tensor ever has a minor dim
below 64. The 4x FLOP inflation is ~20 MFLOP/block — noise next to the
relayouts it removes.

Gradients: custom_vjp whose backward differentiates ``window_mha_ref``
(the pure-JAX mirror of the kernel math), so training stays exact while
the forward stays fused. Non-TPU backends run the kernel in interpret
mode so CPU tests exercise the same code path.

Reference provenance: MyEfficientLFNetV8.py:461-546 (window attention
with Swin relative-position bias).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_mha_kernel(
    x_ref, wqkv_ref, wout_ref, lng_ref, lnb_ref, bias_ref, scale_ref, y_ref,
    *, ws: int, heads: int, eps: float,
):
    """One (batch row, rows-of-windows) grid step: [1, R*ws, W, C] block."""
    x = x_ref[0].astype(jnp.float32)              # [R*ws, W, C]
    H, W, C = x.shape
    R = H // ws
    nww = W // ws
    nw = R * nww
    T = ws * ws
    hd = C // heads

    # --- window partition: [R, ws, nww, ws, C] -> [nw, T, C] -------------
    xw = x.reshape(R, ws, nww, ws, C).transpose(0, 2, 1, 3, 4).reshape(nw, T, C)

    # --- LayerNorm over C (f32) -----------------------------------------
    mu = jnp.mean(xw, axis=-1, keepdims=True)
    xc = xw - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps)
    ln = ln * lng_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)

    # --- qkv projection (one [nw*T, C] @ [C, 3C] matmul) -----------------
    qkv = jax.lax.dot_general(
        ln.reshape(nw * T, C), wqkv_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(nw, T, 3 * C)
    q = qkv[:, :, :C] * (1.0 / (hd ** 0.5))
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C :]

    # --- head-masked stacked K/V: [nw, heads*T, C] -----------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, heads * T, C), 2)
    hrow = jax.lax.broadcasted_iota(jnp.int32, (1, heads * T, C), 1) // T
    mask = (lane // hd == hrow).astype(jnp.float32)
    k_big = jnp.concatenate([k] * heads, axis=1) * mask
    v_big = jnp.concatenate([v] * heads, axis=1) * mask

    # --- scores: contraction over full C ---------------------------------
    s_big = jax.lax.dot_general(
        q, k_big,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nw, T, heads*T]
    s_big = s_big + bias_ref[:].astype(jnp.float32)[None]

    # --- per-head softmax over lane segments of T ------------------------
    parts = []
    for h in range(heads):
        s_h = s_big[:, :, h * T : (h + 1) * T]
        s_h = s_h - jnp.max(s_h, axis=-1, keepdims=True)
        e = jnp.exp(s_h)
        parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
    p_big = jnp.concatenate(parts, axis=-1)  # [nw, T, heads*T]

    # --- attention-weighted values: per-head via the same masking --------
    o = jax.lax.dot_general(
        p_big, v_big,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nw, T, C]

    # --- output projection + scaled residual ----------------------------
    out = jax.lax.dot_general(
        o.reshape(nw * T, C), wout_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(nw, T, C)
    out = out * scale_ref[0, 0]

    # --- un-window: [R, nww, ws, ws, C] -> [R*ws, W, C], residual add ----
    y = out.reshape(R, nww, ws, ws, C).transpose(0, 2, 1, 3, 4).reshape(H, W, C)
    y_ref[0] = (x + y).astype(y_ref.dtype)


def _win_mha_raw(x, wqkv, wout, ln_g, ln_b, bias, attn_scale, *,
                 ws: int, heads: int, eps: float, interpret: bool,
                 rows_per_block: int = 2):
    B, H, W, C = x.shape
    T = ws * ws
    nrows = H // ws
    # per-step intermediates scale with nw = R * W/ws; at whole-scene
    # widths (W=640) R=2 needs ~72 MB scoped vmem — drop to one window
    # row per step there
    if W > 320:
        rows_per_block = 1
    R = rows_per_block if nrows % rows_per_block == 0 else 1
    grid = (B, nrows // R)

    return pl.pallas_call(
        functools.partial(_win_mha_kernel, ws=ws, heads=heads, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R * ws, W, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, heads * T), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, R * ws, W, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        # the per-step intermediates (s_big/p_big/k_big/v_big at
        # [nw, T, heads*T]) sit near the default 16 MB scoped-vmem limit
        # at rows_per_block=2; larger grids (minibatch > 8) tipped the
        # compiler's accounting over it. v5e has 128 MB of VMEM — raise
        # the scoped limit rather than shrink the (faster) block.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, wout, ln_g[None], ln_b[None], bias, attn_scale.reshape(1, 1))


def window_mha_ref(x, wqkv, wout, ln_g, ln_b, bias, attn_scale, *,
                   ws: int = 8, heads: int = 4, eps: float = 1e-6):
    """Pure-JAX mirror of the kernel math (backward path + oracle).

    x: [B, H, W, C] (H, W multiples of ws); wqkv [C, 3C]; wout [C, C];
    ln_g/ln_b [C]; bias [T, heads*T] with head h's [T, T] block at lane
    offset h*T; attn_scale scalar array. Returns x + attn_scale * MHA(LN(x)).
    """
    B, H, W, C = x.shape
    T = ws * ws
    hd = C // heads
    f32 = jnp.float32
    xw = x.astype(f32).reshape(B, H // ws, ws, W // ws, ws, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, T, C)

    mu = jnp.mean(xw, axis=-1, keepdims=True)
    xc = xw - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps) * ln_g.astype(f32) + ln_b.astype(f32)

    qkv = ln @ wqkv.astype(f32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(-1, T, heads, hd) * (1.0 / (hd ** 0.5))
    k = k.reshape(-1, T, heads, hd)
    v = v.reshape(-1, T, heads, hd)
    s = jnp.einsum("wihd,wjhd->whij", q, k)
    b_heads = jnp.stack(
        [bias.astype(f32)[:, h * T : (h + 1) * T] for h in range(heads)], 0
    )
    s = s + b_heads[None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whij,wjhd->wihd", p, v).reshape(-1, T, C)
    out = (o @ wout.astype(f32)) * attn_scale.astype(f32).reshape(())

    out = out.reshape(B, H // ws, W // ws, ws, ws, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    return (x.astype(f32) + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def window_mha_fused(x, wqkv, wout, ln_g, ln_b, bias, attn_scale,
                     ws: int = 8, heads: int = 4, eps: float = 1e-6):
    """Fused windowed MHA block; reference-math gradients.

    Same contract as :func:`window_mha_ref`. On non-TPU backends the
    kernel runs in interpret mode.
    """
    interpret = jax.default_backend() != "tpu"
    return _win_mha_raw(
        x, wqkv, wout, ln_g, ln_b, bias, attn_scale,
        ws=ws, heads=heads, eps=eps, interpret=interpret,
    )


def _fwd(x, wqkv, wout, ln_g, ln_b, bias, attn_scale, ws, heads, eps):
    y = window_mha_fused(x, wqkv, wout, ln_g, ln_b, bias, attn_scale,
                         ws, heads, eps)
    return y, (x, wqkv, wout, ln_g, ln_b, bias, attn_scale)


def _bwd(ws, heads, eps, res, g):
    ref = functools.partial(window_mha_ref, ws=ws, heads=heads, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


window_mha_fused.defvjp(_fwd, _bwd)
