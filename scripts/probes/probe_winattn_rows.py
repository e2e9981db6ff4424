"""Sweep rows_per_block for the fused window MHA kernel."""
import functools
import jax, jax.numpy as jnp, numpy as np
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops import pallas_attention as pa

B, H, W, C, ws, heads = 8, 160, 160, 64, 8, 4
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
wqkv = jax.random.normal(key, (C, 3 * C), jnp.float32) * 0.05
wout = jax.random.normal(key, (C, C), jnp.float32) * 0.05
g = jnp.ones((C,), jnp.float32)
b = jnp.zeros((C,), jnp.float32)
bias = jax.random.normal(key, (64, heads * 64), jnp.float32) * 0.02
sc = jnp.asarray(0.25, jnp.float32)

for R in (1, 2, 4, 5):
    f = functools.partial(pa._win_mha_raw, wqkv=None)
    def run(x, R=R):
        return pa._win_mha_raw(x, wqkv, wout, g, b, bias, sc,
                               ws=ws, heads=heads, eps=1e-6,
                               interpret=False, rows_per_block=R)
    timed_loop(run, x, reps=20, name=f"win-mha rows_per_block={R}")
