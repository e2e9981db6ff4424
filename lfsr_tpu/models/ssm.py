"""Mamba block (flax) with mamba_ssm-compatible semantics.

Replaces the reference's external CUDA dependency (``mamba_ssm.Mamba``,
d_model<=72, d_state<=24, expand 1.25, d_conv 4 — MyEfficientLFNetV8.py
:375-455) with TPU kernels from lfsr_tpu.ops.pallas_scan.

Structure mirrors mamba_ssm.modules.mamba_simple.Mamba:
  in_proj (D -> 2*Di) -> [x | z]
  x: causal depthwise conv1d (width d_conv) -> silu
     x_proj (Di -> dt_rank + 2N) -> [dt | B | C]
     dt_proj (dt_rank -> Di) + bias -> softplus
     selective_scan(x, dt, A=-exp(A_log), B, C, D)
  y = scan * silu(z) -> out_proj (Di -> D)

On TPU the scan runs as a Pallas kernel (``selective_scan_fused``) while
the projections/conv/gate stay in XLA — measured on v5e this SPLIT is
faster (5.8 ms vs 6.6 ms at B8/L25600/Di80) than fusing the whole inner
pipeline into one kernel (``mamba_inner_fused``, kept selectable via
``scan_impl='fused'``): XLA's fused elementwise+matmul codegen beats the
hand-fused version of the dense parts, and the scan kernel is the only
piece XLA cannot schedule well. Gradients flow through the
associative-scan reference implementation (custom_vjp), so training
stays exact.

``freeze_state_params=True`` reproduces V6_4's frozen A_log/D variant
(MyEfficientLFNetV6_4.py:594-597) by stopping their gradients.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.ops.pallas_scan import mamba_inner_fused, mamba_inner_ref


class Mamba(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: float = 2.0
    dt_rank: int | None = None
    freeze_state_params: bool = False
    # 'pallas' = XLA projections + Pallas scan kernel (fastest measured);
    # 'fused'  = whole inner pipeline in one Pallas kernel;
    # 'assoc'  = pure-JAX reference end to end.
    scan_impl: str = "pallas"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, L, D]
        D = self.d_model
        Di = int(self.expand * D)
        N = self.d_state
        R = self.dt_rank or math.ceil(D / 16)
        dt = self.dtype

        w_in = self.param(
            "in_proj_kernel", nn.initializers.lecun_normal(), (D, 2 * Di)
        )
        xz = x.astype(dt) @ w_in.astype(dt)
        xs, z = jnp.split(xz, 2, axis=-1)

        # Causal depthwise conv along L (torch Conv1d groups=Di, pad left)
        w_conv = self.param(
            "conv1d_kernel", nn.initializers.lecun_normal(), (self.d_conv, 1, Di)
        )
        b_conv = self.param("conv1d_bias", nn.initializers.zeros, (Di,))
        w_x = self.param(
            "x_proj_kernel", nn.initializers.lecun_normal(), (Di, R + 2 * N)
        )
        w_dt = self.param("dt_proj_kernel", nn.initializers.lecun_normal(), (R, Di))
        b_dt = self.param("dt_proj_bias", nn.initializers.zeros, (Di,))

        # State params (A negative via -exp(A_log); D skip)
        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jnp.tile(jnp.arange(1, N + 1, dtype=jnp.float32)[None], (Di, 1))
            ),
            (Di, N),
        )
        D_skip = self.param("D", nn.initializers.ones, (Di,))
        if self.freeze_state_params:
            A_log = jax.lax.stop_gradient(A_log)
            D_skip = jax.lax.stop_gradient(D_skip)
        A = -jnp.exp(A_log)

        w_out = self.param(
            "out_proj_kernel", nn.initializers.lecun_normal(), (Di, D)
        )

        L = xs.shape[1]
        on_tpu = jax.default_backend() == "tpu"
        if self.scan_impl in ("pallas", "gated") and on_tpu:
            # XLA dense ops + Pallas scan (fastest measured split)
            xc = self._conv_silu(xs, w_conv, b_conv, dt)
            dbc = xc @ w_x.astype(dt)
            # The kernel needs L % chunk == 0. The scan is causal, so
            # zero-padding the TAIL leaves outputs [:L] bit-exact — pad
            # here rather than fall back to the associative-scan
            # reference, whose O(log L) [B,L,Di,N] HBM intermediates OOM
            # at whole-scene lengths (L=533k at the NTIRE Real geometry
            # allocated a 4 GB exp() alone).
            Lp = -(-L // 128) * 128
            if Lp != L:
                xc = jnp.pad(xc, ((0, 0), (0, Lp - L), (0, 0)))
                dbc = jnp.pad(dbc, ((0, 0), (0, Lp - L), (0, 0)))
            chunk = 256 if Lp % 256 == 0 else 128
            if self.scan_impl == "gated":
                # epilogue (D-skip + silu(z) gate + out_proj) fused into
                # the kernel — measured NEUTRAL on v5e (2.79 vs 2.64 ms at
                # B8/L25600/Di80): the kernel is VPU-bound, so the added
                # in-kernel epilogue work costs what the removed
                # [B, L, Di] HBM round-trips save. Kept opt-in (PERF.md).
                from lfsr_tpu.ops.pallas_scan import scan_gated_fused

                dt_raw = dbc[..., :R] @ w_dt.astype(dt) + b_dt.astype(dt)
                Bc, Cc = dbc[..., R : R + N], dbc[..., R + N :]
                zp = (
                    jnp.pad(z, ((0, 0), (0, Lp - L), (0, 0)))
                    if Lp != L else z
                )
                out = scan_gated_fused(
                    xc, dt_raw, A, Bc, Cc, zp, D_skip, w_out.astype(dt),
                    chunk, True
                )
                return out[:, :L] if Lp != L else out
            # dt projection + softplus + B/C extraction run INSIDE the
            # kernel off the raw x_proj output — avoids the [B, L, Di]
            # dt_raw round-trip and the narrow [B, L, N] lane extractions
            from lfsr_tpu.ops.pallas_scan import selective_scan_proj

            y = selective_scan_proj(xc, dbc, w_dt, b_dt, A, D_skip, chunk)
            if Lp != L:
                y = y[:, :L]
            # (Gating in bf16 instead measured NEUTRAL at mb=2 — the f32
            # casts here fuse into neighbors; keep the f32 gate precision.)
            y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
        elif self.scan_impl == "fused" and on_tpu and L % 128 == 0:
            y = mamba_inner_fused(
                xs, z, w_conv[:, 0, :], b_conv, w_x, w_dt, b_dt, A, D_skip
            )
        else:
            y = mamba_inner_ref(
                xs, z, w_conv[:, 0, :], b_conv, w_x, w_dt, b_dt, A, D_skip
            )

        return y.astype(dt) @ w_out.astype(dt)

    @staticmethod
    def _conv_silu(xs, w_conv, b_conv, dt):
        """Causal depthwise conv1d + SiLU (torch Conv1d groups=Di, pad left).

        Applied as K shifted multiplies + adds: identical math, but pure
        elementwise ops that XLA fuses with the surrounding projections
        (the grouped-conv lowering is latency-bound at eval batch sizes —
        same finding as lfmambax._DW_SHIFT)."""
        K = w_conv.shape[0]
        L = xs.shape[1]
        xp = jnp.pad(xs.astype(dt), ((0, 0), (K - 1, 0), (0, 0)))
        w = w_conv[:, 0, :].astype(dt)  # [K, Di]
        xc = b_conv.astype(dt) + sum(
            xp[:, k : k + L, :] * w[k] for k in range(K)
        )
        return jax.nn.silu(xc)
