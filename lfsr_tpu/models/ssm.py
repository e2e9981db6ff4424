"""Mamba block (flax) with mamba_ssm-compatible semantics.

Replaces the reference's external CUDA dependency (``mamba_ssm.Mamba``,
d_model<=72, d_state<=24, expand 1.25, d_conv 4 — MyEfficientLFNetV8.py
:375-455) with the TPU-parallel selective scan from
lfsr_tpu.ops.selective_scan.

Structure mirrors mamba_ssm.modules.mamba_simple.Mamba:
  in_proj (D -> 2*Di) -> [x | z]
  x: causal depthwise conv1d (width d_conv) -> silu
     x_proj (Di -> dt_rank + 2N) -> [dt | B | C]
     dt_proj (dt_rank -> Di) + bias -> softplus
     selective_scan(x, dt, A=-exp(A_log), B, C, D)
  y = scan * silu(z) -> out_proj (Di -> D)

``freeze_state_params=True`` reproduces V6_4's frozen A_log/D variant
(MyEfficientLFNetV6_4.py:594-597) by stopping their gradients.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from lfsr_tpu.ops.pallas_scan import selective_scan_fused
from lfsr_tpu.ops.selective_scan import selective_scan


class Mamba(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: float = 2.0
    dt_rank: int | None = None
    freeze_state_params: bool = False
    # 'pallas' = fused VMEM-chunked kernel (forward) + chunked-scan VJP;
    # 'assoc' = pure associative_scan (reference implementation).
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

        xz = nn.Dense(2 * Di, use_bias=False, dtype=dt, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # Causal depthwise conv along L (torch Conv1d groups=Di, pad left)
        w = self.param(
            "conv1d_kernel",
            nn.initializers.lecun_normal(),
            (self.d_conv, 1, Di),
        )
        b = self.param("conv1d_bias", nn.initializers.zeros, (Di,))
        xp = jnp.pad(xs, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xc = jax.lax.conv_general_dilated(
            xp.astype(dt),
            w.astype(dt),
            (1,),
            "VALID",
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=Di,
        ) + b.astype(dt)
        xc = nn.silu(xc)

        # Input-dependent dt, B, C
        dbc = nn.Dense(R + 2 * N, use_bias=False, dtype=dt, name="x_proj")(xc)
        dt_lowrank, Bc, Cc = jnp.split(dbc, [R, R + N], axis=-1)
        dt_full = nn.Dense(Di, use_bias=True, dtype=dt, name="dt_proj")(dt_lowrank)
        delta = nn.softplus(dt_full.astype(jnp.float32))

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

        L = xc.shape[1]
        on_tpu = jax.default_backend() == "tpu"
        if self.scan_impl == "pallas" and on_tpu and L % 128 == 0:
            chunk = 256 if L % 256 == 0 else 128
            y = selective_scan_fused(xc, delta, A, Bc, Cc, D_skip, chunk)
        elif L % 256 == 0 and L > 4096:
            # long rasters: bound the [*, D, N] intermediates to one chunk
            from lfsr_tpu.ops.selective_scan import selective_scan_chunked

            y = selective_scan_chunked(xc, delta, A, Bc, Cc, D_skip, chunk=256)
        else:
            y = selective_scan(xc, delta, A, Bc, Cc, D_skip)
        y = y * nn.silu(z)
        return nn.Dense(D, use_bias=False, dtype=dt, name="out_proj")(y)
