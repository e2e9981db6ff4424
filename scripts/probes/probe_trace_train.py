"""XProf trace of the full production train step (grad + optimizer +
metrics) at batch 8 SAI-160; summarize device op time by op name."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays
from lfsr_tpu.train.trainer import Trainer

LOGDIR = "/tmp/lfsr_trace_train_r3"
B = int(os.environ.get("PROBE_B", "8"))

cfg = Config(
    model_name=os.environ.get("PROBE_MODEL", "LFMambaX"),
    scale_factor=4, batch_size=B, epochs=50, use_masked_pretrain=False,
)
rng = np.random.default_rng(0)
lr = jnp.asarray(rng.random((B, 160, 160)).astype(np.float32))
hr = jnp.asarray(rng.random((B, 640, 640)).astype(np.float32))
tr = Trainer(cfg, steps_per_epoch=100)
state = tr.init_state(jax.random.key(0), np.zeros((1, 160, 160, 1), np.float32))
fn = tr.step_fn(0)
state, m = fn(state, lr, hr, jax.random.key(1), jnp.float32(0.0))
np.asarray(m["loss"])  # compile + sync

os.system(f"rm -rf {LOGDIR}")
jax.profiler.start_trace(LOGDIR)
N = 4
for i in range(N):
    state, m = fn(state, lr, hr, jax.random.key(2 + i), jnp.float32(0.0))
np.asarray(m["loss"])
jax.profiler.stop_trace()

files = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
raw = defaultdict(float)
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm.lower() or "XLA Op" in nm:
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        raw[ev.get("name", "")] += ev.get("dur", 0) / 1e3
        total += ev.get("dur", 0) / 1e3
print(f"total device op ms ({N} steps): {total:.1f}  per-step: {total/N:.1f}")
for name, ms in sorted(raw.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{ms/N:8.3f} ms/step  {name}")
