"""Sweep the selective-scan kernel chunk size at the production eval
shape (mb=2 -> B=2, L=25600, Di=80, N=16). chunk=256 was tuned at mb=8;
fewer/fatter grid steps may pay in the latency-bound regime."""
import functools
import os

import jax
import jax.numpy as jnp

from scripts.probes._harness import timed_loop
from lfsr_tpu.ops import pallas_scan as ps

B = int(os.environ.get("PROBE_B", "2"))
L, Di, N, R = 25600, 80, 16, 4
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
u = (jax.random.normal(ks[0], (B, L, Di), jnp.float32) * 0.1).astype(jnp.bfloat16)
dbc = (jax.random.normal(ks[1], (B, L, R + 2 * N), jnp.float32) * 0.1).astype(jnp.bfloat16)
Wdt = jax.random.normal(ks[2], (R, Di), jnp.float32) * 0.1
bdt = jax.random.normal(ks[3], (Di,), jnp.float32) * 0.1
A = -jnp.exp(jax.random.normal(ks[4], (Di, N), jnp.float32) * 0.3)

for chunk in (128, 256, 512, 1280, 1600, 3200):
    if L % chunk:
        continue
    f = functools.partial(ps._scan_proj_raw, Wdt=Wdt, bdt=bdt, A=A, chunk=chunk)
    try:
        timed_loop(lambda x, _f=f: _f(x, dbc), u, reps=30,
                   name=f"scan_proj B={B} chunk={chunk}")
    except Exception as e:
        print(f"chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:120]}")
