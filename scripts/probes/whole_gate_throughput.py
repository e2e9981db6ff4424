"""Whole-scene throughput gate rows (VERDICT r4 #2c/#5): for each
tiled-eval model that might win from un-tiled evaluation, measure BOTH
eval modes on the real chip at the bench geometry. The PSNR half of the
gate runs separately on trained demo checkpoints (eval_modes_gate.py).

Run: python -m scripts.probes.whole_gate_throughput [model ...]
"""
import json
import sys

from bench import bench_model

MODELS = sys.argv[1:] or ["EPIT", "LFT", "LF_DET"]

for m in MODELS:
    for force, tag in ((None, "production"), (True, "forced-whole")):
        try:
            r = bench_model(m, None, 3, force_whole=force)
            r["mode_tag"] = tag
        except Exception as e:
            r = {"model": m, "mode_tag": tag,
                 "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(r), flush=True)
