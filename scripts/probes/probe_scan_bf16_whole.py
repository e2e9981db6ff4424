"""TPU A/B: whole-scene production runner with f32 vs bf16 scan-combine
(ops/pallas_scan.set_scan_combine_dtype). Times the full flagship
whole-scene dispatch and reports per-scene ms + output drift.

Run: python -m scripts.probes.probe_scan_bf16_whole
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.ops import pallas_scan as pls
from lfsr_tpu.train.evaluate import _whole_batch_runner

MB = int(os.environ.get("PROBE_MB", "4"))
H0 = int(os.environ.get("PROBE_H0", "128"))
REPS = int(os.environ.get("PROBE_REPS", "12"))

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.random((MB, 5 * H0, 5 * H0)), jnp.float32)


def run(tag):
    runner = _whole_batch_runner(model.apply, 5, 5, 4, cfg.whole_scene_pad)
    fn = jax.jit(runner)
    out = np.asarray(fn(params, batch))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(params, batch)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag}: {dt*1e3/MB:.2f} ms/scene  ({MB/dt:.3f} scenes/s)")
    return out


pls.set_scan_combine_dtype(jnp.float32)
o32 = run("combine f32 ")
pls.set_scan_combine_dtype(jnp.bfloat16)
o16 = run("combine bf16")
pls.set_scan_combine_dtype(jnp.float32)

d = np.abs(o32 - o16)
print(f"max|diff|={d.max():.3e}  mean|diff|={d.mean():.3e}  "
      f"(SR output in [0,1]; 1 LSB of 8-bit = 3.9e-3)")
