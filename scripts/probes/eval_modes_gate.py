"""Quality gate for the eval-mode levers on the trained demo checkpoint.

Compares, on the train_demo held-out scenes, the production tiled
center-crop evaluation against (a) whole-scene un-tiled evaluation
(Config.whole_scene_for_test) and (b) EPSW Gaussian-blended stitching
(Config.epsw_for_test). The whole-scene path is the round-3 headline
perf lever (2.5x fewer FLOPs per scene) — this is the PSNR evidence
required before any default flips.
"""
import sys
import time
from pathlib import Path

import jax
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import load_test_scenes
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import evaluate_scene
from lfsr_tpu.train.trainer import Trainer, latest_checkpoint, restore_checkpoint

ROOT = Path("/tmp/lfsr_train_demo")
base = Config(
    model_name=sys.argv[1] if len(sys.argv) > 1 else "LFMambaX",
    scale_factor=4,
    path_for_train=str(ROOT / "data_for_train"),
    path_for_test=str(ROOT / "data_for_test"),
    path_log=str(ROOT / "log"),
    batch_size=4, mesh_shape=(1,),
)
from lfsr_tpu.utils import create_dirs
_, ckpt_dir, _ = create_dirs(base)
ck = latest_checkpoint(ckpt_dir)
print("checkpoint:", ck, flush=True)
tr = Trainer(base, 48)
state = tr.init_state(jax.random.key(0), np.zeros((1, 160, 160, 1), np.float32))
state, epoch = restore_checkpoint(ck, state)
print("epoch:", epoch, flush=True)
model = registry.get_model(base)
sets = load_test_scenes(base.path_for_test, 5, 4, "ALL", tag=base.task_tag())
scenes = sets["SynthVal"]

modes = {
    "tiled-crop (reference)": base.replace(whole_scene_for_test=False),
    "tiled-EPSW": base.replace(whole_scene_for_test=False, epsw_for_test=True),
    "whole-scene pad=0": base.replace(whole_scene_for_test=True, whole_scene_pad=0),
    "whole-scene pad=4": base.replace(whole_scene_for_test=True, whole_scene_pad=4),
    "whole-scene pad=8": base.replace(whole_scene_for_test=True, whole_scene_pad=8),
    "whole-scene (production)": base.replace(whole_scene_for_test=True),
}
for name, cfg in modes.items():
    ps, ss, ts = [], [], []
    for sc in scenes:
        t0 = time.perf_counter()
        p, s, _ = evaluate_scene(model.apply, state.variables, sc, cfg)
        ts.append(time.perf_counter() - t0)
        ps.append(p)
        ss.append(s)
    print(
        f"{name:26s}: PSNR {np.mean(ps):.4f}  SSIM {np.mean(ss):.5f}  "
        f"(last-scene wall {ts[-1]*1e3:.0f} ms)",
        flush=True,
    )
