"""Time the flat-lane scan kernel vs the padded-lane variant at the
model's eval point (B8, L25600, Di80, N16)."""
import numpy as np
import jax, jax.numpy as jnp
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops import pallas_scan as ps

B, L, Di, N = 8, 25600, 80, 16
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((B, L, Di)), jnp.bfloat16)
dt = jnp.asarray(rng.standard_normal((B, L, Di)), jnp.bfloat16)
A = -jnp.asarray(np.abs(rng.standard_normal((Di, N))) + 0.1, jnp.float32)
Bc = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)
Cc = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)

def run_flat(u):
    return ps._scan_pallas_raw(u, dt, A, Bc, Cc, pre_softplus=True)
timed_loop(run_flat, u, reps=10, name="scan flat-lane")

def run_padded(u):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    chunk = 256
    inner = ps._pick_inner(L // chunk)
    blk = chunk * inner
    idx_bt = lambda i, j: (i, j, 0)
    return pl.pallas_call(
        functools.partial(ps._scan_chunk_kernel, T=chunk, inner=inner, pre_softplus=True),
        grid=(B, L // blk),
        in_specs=[
            pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Di), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, N), idx_bt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, Di), idx_bt, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Di), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, Di), jnp.float32)],
    )(u, dt, A.T, Bc, Cc)
timed_loop(run_padded, u, reps=10, name="scan padded-lane (old)")
