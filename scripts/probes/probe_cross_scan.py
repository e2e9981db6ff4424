"""TPU probe: cross-scan gather/scatter kernels — correctness vs the XLA
reference and speed at the eval point."""
import os

import jax, jax.numpy as jnp
import numpy as np
from scripts.probes._harness import timed_loop
from lfsr_tpu.ops import pallas_layout as pll

B = int(os.environ.get("PROBE_B", "8"))
S = int(os.environ.get("PROBE_S", "160"))
C = int(os.environ.get("PROBE_C", "64"))
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
x = jax.random.normal(ks[0], (B, S, S, C), jnp.bfloat16)
gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
beta = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
w = 0.2 * jax.random.normal(ks[3], (C, C), jnp.bfloat16)
scale = jnp.asarray([0.15], jnp.float32)
seq = jax.random.normal(ks[3], (B, S * S, C), jnp.bfloat16)

# Off-envelope shapes silently dispatch to the XLA reference inside
# cross_scan_gather/scatter — say which path the probe is measuring, so a
# reference-vs-reference run (diff 0.0, identical timings) is visible.
print(
    f"kernel path active: {pll._gather_supported(x)} "
    f"(S={S} C={C}; needs square map, S%8==0, C/4 lane-tileable)"
)

# correctness (compiled Mosaic vs XLA ref)
g_k = np.asarray(jax.jit(pll.cross_scan_gather)(x, gamma, beta)).astype(np.float32)
g_r = np.asarray(jax.jit(pll.cross_scan_gather_ref)(x, gamma, beta)).astype(np.float32)
print("gather max|diff|:", np.abs(g_k - g_r).max())
s_k = np.asarray(jax.jit(pll.cross_scan_scatter)(seq, x, w, scale)).astype(np.float32)
s_r = np.asarray(jax.jit(pll.cross_scan_scatter_ref)(seq, x, w, scale)).astype(np.float32)
print("scatter max|diff|:", np.abs(s_k - s_r).max())

# speed
timed_loop(lambda x_: pll.cross_scan_gather(x_, gamma, beta).reshape(B, S, S, C),
           x, reps=30, name="gather kernel")
timed_loop(lambda x_: pll.cross_scan_gather_ref(x_, gamma, beta).reshape(B, S, S, C),
           x, reps=30, name="gather XLA ref")
timed_loop(lambda s_: pll.cross_scan_scatter(s_.reshape(B, S * S, C), x, w, scale)
           .reshape(B, S * S, C), seq, reps=30, name="scatter kernel")
timed_loop(lambda s_: pll.cross_scan_scatter_ref(s_.reshape(B, S * S, C), x, w, scale)
           .reshape(B, S * S, C), seq, reps=30, name="scatter XLA ref")

# r5 XLA reformulations (double-flip + shared transpose / scan-space mix)
g2 = np.asarray(jax.jit(pll.cross_scan_gather_v2)(x, gamma, beta)).astype(np.float32)
print("gather v2 max|diff|:", np.abs(g2 - g_r).max())
s2 = np.asarray(jax.jit(pll.cross_scan_scatter_v2)(seq, x, w, scale)).astype(np.float32)
print("scatter v2 max|diff|:", np.abs(s2 - s_r).max())
timed_loop(lambda x_: pll.cross_scan_gather_v2(x_, gamma, beta).reshape(B, S, S, C),
           x, reps=30, name="gather v2 XLA")
timed_loop(lambda s_: pll.cross_scan_scatter_v2(s_.reshape(B, S * S, C), x, w, scale)
           .reshape(B, S * S, C), seq, reps=30, name="scatter v2 XLA")
