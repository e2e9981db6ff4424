"""Sweep rows_per_block for the fused window-MHA kernel (needs the
64MB scoped-vmem limit; R=2 was chosen under the old 16MB ceiling)."""
import functools
import numpy as np
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops import pallas_attention as pa

import os
B = int(os.environ.get("PROBE_MB", "8"))
H, W, C = 160, 160, 64
ws, heads = 8, 4
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
wqkv = jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.1
wout = jax.random.normal(ks[2], (C, C), jnp.float32) * 0.1
ln_g = jnp.ones((C,), jnp.float32)
ln_b = jnp.zeros((C,), jnp.float32)
T = ws * ws
bias = jax.random.normal(ks[3], (T, heads * T), jnp.float32) * 0.02
scale = jnp.asarray([0.3], jnp.float32)

ref = None
for R in (1, 2, 4, 5, 10, 20):
    f = functools.partial(pa._win_mha_raw, ws=ws, heads=heads, eps=1e-6,
                          interpret=False, rows_per_block=R)
    try:
        y = np.asarray(jax.jit(lambda x_: f(x_, wqkv, wout, ln_g, ln_b, bias, scale))(x))
        if ref is None:
            ref = y
        else:
            assert np.abs(y - ref).max() < 1e-4, f"R={R} mismatch"
        timed_loop(lambda x_, f=f: f(x_, wqkv, wout, ln_g, ln_b, bias, scale),
                   x, reps=40, name=f"win-mha R={R}")
    except Exception as e:
        print(f"R={R}: FAILED {str(e)[:150]}")
