"""Depthwise 3x3 conv: XLA conv_general vs shift-mul-add formulation."""
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop

B, H, W, C = 2, 160, 160, 48
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
w = jax.random.normal(key, (3, 3, 1, C), jnp.bfloat16) * 0.2


def dw_conv(x_):
    return jax.lax.conv_general_dilated(
        x_, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def dw_shift(x_):
    xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(x_, dtype=jnp.float32)
    for ky in range(3):
        for kx in range(3):
            out = out + xp[:, ky : ky + H, kx : kx + W, :].astype(jnp.float32) * w[ky, kx, 0].astype(jnp.float32)
    return out.astype(x_.dtype)


import numpy as np
a = np.asarray(jax.jit(dw_conv)(x)).astype(np.float32)
b = np.asarray(jax.jit(dw_shift)(x)).astype(np.float32)
print("max|diff|:", np.abs(a - b).max())
timed_loop(dw_conv, x, reps=50, name="dw conv_general [2,160,160,48]")
timed_loop(dw_shift, x, reps=50, name="dw shift-mul-add [2,160,160,48]")

B8 = jax.random.normal(key, (8, H, W, C), jnp.bfloat16)
timed_loop(dw_conv, B8, reps=50, name="dw conv_general [8,...]")
timed_loop(dw_shift, B8, reps=50, name="dw shift-mul-add [8,...]")
