"""Isolated probe: gated-epilogue scan kernel vs split (kernel + XLA epilogue)."""
import jax, jax.numpy as jnp
import numpy as np
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops.pallas_scan import scan_gated_fused, selective_scan_fused

B, L, Di, N, D = 8, 25600, 80, 16, 64
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
bf = jnp.bfloat16
u = jax.random.normal(ks[0], (B, L, Di), bf)
dt_raw = jax.random.normal(ks[1], (B, L, Di), bf)
A = -jnp.exp(jax.random.normal(ks[2], (Di, N), jnp.float32) * 0.2)
Bc = jax.random.normal(ks[3], (B, L, N), bf)
Cc = jax.random.normal(ks[4], (B, L, N), bf)
z = jax.random.normal(ks[5], (B, L, Di), bf)
Dk = jax.random.normal(ks[6], (Di,), jnp.float32)
Wout = jax.random.normal(ks[7], (Di, D), bf) * 0.1


def gated(u_):
    return scan_gated_fused(u_, dt_raw, A, Bc, Cc, z, Dk, Wout, 256, True)


def split(u_):
    y = selective_scan_fused(u_, dt_raw, A, Bc, Cc, Dk, 256, True)
    y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(bf) @ Wout


timed_loop(gated, u, reps=20, name="scan_gated (fused epilogue)")
timed_loop(split, u, reps=20, name="scan + XLA epilogue")
timed_loop(gated, u, reps=20, name="scan_gated again")
