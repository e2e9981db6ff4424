"""Capture an XProf trace of the flagship forward at mb=8 and summarize
device op time by bucket (parses the perfetto trace.json.gz the
jax.profiler writes)."""
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
from lfsr_tpu.models import registry

LOGDIR = "/tmp/lfsr_trace_r3"

import os
B = int(os.environ.get("PROBE_MB", "8"))
H = int(os.environ.get("PROBE_H", "160"))
W = int(os.environ.get("PROBE_W", "160"))
MODEL = os.environ.get("PROBE_MODEL", "LFMambaX")
cfg = Config(model_name=MODEL, scale_factor=4)
model = registry.get_model(cfg)
xin = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 1), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32))
fn = jax.jit(lambda x: jnp.sum(model.apply(params, x)))
np.asarray(fn(xin))  # compile

os.system(f"rm -rf {LOGDIR}")
jax.profiler.start_trace(LOGDIR)
outs = [fn(xin) for _ in range(6)]
np.asarray(outs[-1])
jax.profiler.stop_trace()

files = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
buckets = defaultdict(float)
raw = defaultdict(float)
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    # find TPU device track pids
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm.lower() or "XLA Op" in nm:
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        raw[name] += dur
        total += dur
print(f"total device op ms (6 iters): {total:.1f}  per-iter: {total/6:.1f}")
for name, ms in sorted(raw.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{ms/6:8.3f} ms/iter  {name}")
