"""TPU A/B: whole-scene production runner under each cross-scan impl
('kernel' Pallas / 'xla' reference / 'xla_v2' double-flip forms) —
the end-to-end measurement the production default follows.

Run: python -m scripts.probes.probe_cross_scan_e2e
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.ops import pallas_layout as pll
from lfsr_tpu.train.evaluate import _whole_batch_runner

MB = int(os.environ.get("PROBE_MB", "4"))
H0 = int(os.environ.get("PROBE_H0", "128"))
REPS = int(os.environ.get("PROBE_REPS", "12"))
IMPLS = os.environ.get("PROBE_IMPLS", "kernel,xla,xla_v2").split(",")

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.random((MB, 5 * H0, 5 * H0)), jnp.float32)

outs = {}
for impl in IMPLS:
    pll.set_cross_scan_impl(impl)
    runner = _whole_batch_runner(model.apply, 5, 5, 4, cfg.whole_scene_pad)
    fn = jax.jit(runner)
    t0 = time.perf_counter()
    outs[impl] = np.asarray(fn(params, batch))  # compile + warm
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(params, batch)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{impl:8s}: {dt*1e3/MB:.2f} ms/scene ({MB/dt:.3f} scenes/s), "
          f"compile+first {tc:.1f} s")
pll.set_cross_scan_impl("kernel")

base = outs[IMPLS[0]]
for impl in IMPLS[1:]:
    print(f"max|{impl}-{IMPLS[0]}|: {np.abs(outs[impl]-base).max():.3e}")
