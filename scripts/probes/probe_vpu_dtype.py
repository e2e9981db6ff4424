"""TPU microprobe: VPU elementwise throughput f32 vs bf16 inside a
Pallas kernel — decides whether a bf16 scan-combine is worth building
(if bf16 VPU rate is ~1x f32, it is not). Also times jnp.exp to size
the dA-construction share of the scan kernel.

Run: python -m scripts.probes.probe_vpu_dtype
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.probes._harness import timed_loop

R = 48  # elementwise ops per element per pass


def _kern(x_ref, o_ref, *, dtype, use_exp):
    x = x_ref[:].astype(dtype)
    acc = x
    for i in range(R):
        if use_exp and i % 8 == 0:
            acc = jnp.exp(acc * jnp.array(-0.013, dtype))
        else:
            acc = acc * jnp.array(1.0009, dtype) + x
    o_ref[:] = acc.astype(o_ref.dtype)


def run(dtype, use_exp, M=4096, Ncol=1280):
    x = jax.random.normal(jax.random.PRNGKey(0), (M, Ncol), jnp.float32)

    f = pl.pallas_call(
        functools.partial(_kern, dtype=dtype, use_exp=use_exp),
        grid=(8,),
        in_specs=[pl.BlockSpec((M // 8, Ncol), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M // 8, Ncol), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Ncol), jnp.float32),
    )
    name = f"{np.dtype(dtype).name:8s} exp={use_exp}"
    dt = timed_loop(f, x, reps=50, name=name)  # seconds per pass
    ops = M * Ncol * R
    print(f"    -> {ops/dt/1e9:.1f} Gop/s")


if __name__ == "__main__":
    for use_exp in (False, True):
        for dt in (jnp.float32, jnp.bfloat16):
            run(dt, use_exp)
