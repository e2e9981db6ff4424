"""Whole-scene throughput vs whole_scene_pad on the real chip.

The r3 pad sweep timed pad=4/12 BEFORE the scan kernel learned to pad L
to a chunk multiple (commit 7635c91) — those rows measured the
associative-scan fallback, not the production kernels. Re-time the
production `_whole_batch_runner` across pads now that every pad value
takes the kernel path. Run: python -m scripts.probes.probe_pad_sweep_tput
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
ITERS = int(os.environ.get("PROBE_ITERS", "10"))
PADS = tuple(
    int(p) for p in os.environ.get("PROBE_PADS", "8,4,0").split(",")
)

cfg = Config(model_name="LFMambaX", scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
)
rng = np.random.default_rng(0)
batches = [
    jnp.asarray(rng.random((MB, 5 * H0, 5 * H0)), jnp.float32)
    for _ in range(ITERS)
]

for pad in PADS:
    S = 5 * (H0 + 2 * pad)
    probe = jnp.zeros((MB, S, S, 64), jnp.bfloat16)
    runner = _whole_batch_runner(model.apply, 5, 5, 4, pad)
    fn = jax.jit(lambda p, b: jnp.sum(runner(p, b)))
    np.asarray(fn(params, batches[0]))  # compile+warm
    t0 = time.time()
    outs = [fn(params, b) for b in batches]
    np.asarray(outs[-1])
    dt_s = (time.time() - t0) / (ITERS * MB)
    print(
        f"pad={pad:2d} S={S} kernel_path={pll._gather_supported(probe)} "
        f"{dt_s * 1e3:7.1f} ms/scene  {1.0 / dt_s:6.3f} scenes/s",
        flush=True,
    )
