"""XProf trace of the PRODUCTION whole-scene runner with HLO fusion
attribution: besides the bucketed device-op table, dumps the optimized
HLO and prints each top fusion's root instruction + JAX source metadata,
so 'fusion.1517'-style names map back to model code. Run:
    python -m scripts.probes.probe_trace_whole_r5
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import _whole_batch_runner

LOGDIR = "/tmp/lfsr_trace_whole_r5"
MB = int(os.environ.get("PROBE_MB", "2"))
H0 = int(os.environ.get("PROBE_H0", "128"))
MODEL = os.environ.get("PROBE_MODEL", "LFMambaX")
ITERS = int(os.environ.get("PROBE_ITERS", "6"))
TOPN = int(os.environ.get("PROBE_TOPN", "80"))

cfg = Config(model_name=MODEL, scale_factor=4)
model = registry.get_model(cfg)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
)
runner = _whole_batch_runner(model.apply, 5, 5, 4, cfg.whole_scene_pad)
fn = jax.jit(lambda p, b: jnp.sum(runner(p, b)))
rng = np.random.default_rng(0)
batches = [
    jnp.asarray(rng.random((MB, 5 * H0, 5 * H0)), jnp.float32)
    for _ in range(ITERS)
]

# optimized HLO for fusion attribution
comp = fn.lower(params, batches[0]).compile()
hlo = comp.as_text()
with open("/tmp/whole_r5.hlo", "w") as f:
    f.write(hlo)

np.asarray(fn(params, batches[0]))  # compile+warm

os.system(f"rm -rf {LOGDIR}")
jax.profiler.start_trace(LOGDIR)
outs = [fn(params, b) for b in batches]
np.asarray(outs[-1])
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
        nm = ev.get("name", "")
        raw[nm] += ev.get("dur", 0) / 1e3
        total += ev.get("dur", 0) / 1e3

# --- fusion attribution from the optimized HLO ---------------------------
# map "fusion.123" -> its computation's biggest-shape root + op_name meta
fusion_info = {}
cur = None
for line in hlo.splitlines():
    m = re.match(r"\s*%?([\w\.\-]+)\s*=.*(?:fusion|custom-call)\(", line)
    mname = re.search(r'calls=%?([\w\.\-]+)', line)
    meta = re.search(r'op_name="([^"]+)"', line)
    if m:
        fusion_info[m.group(1)] = {
            "calls": mname.group(1) if mname else "",
            "op_name": meta.group(1) if meta else "",
        }

print(f"total device op ms ({ITERS} iters): {total:.1f}  "
      f"per-iter: {total/ITERS:.1f}  per-scene: {total/ITERS/MB:.1f}")
for name, ms in sorted(raw.items(), key=lambda kv: -kv[1])[:TOPN]:
    info = fusion_info.get(name, {})
    src = info.get("op_name", "")
    # compress the jit path to its tail
    src = "/".join(src.split("/")[-3:]) if src else ""
    print(f"{ms/ITERS:8.3f} ms/iter  {name:36s} {src}")
