"""Whole-scene border-pad sweep on the trained demo checkpoint.

Hypothesis: whole-scene eval's -0.036 dB vs tiled (round-3 gate) comes
from scene borders — lf_divide mirror-extends every border patch, while
the un-tiled call leaves borders to each conv's zero padding. Mirror-
extending the whole scene by a few LR pixels should recover it at
negligible cost ((320+2p)^2/320^2 FLOPs).
"""
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import load_test_scenes
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import sr_scene, _score_views
from lfsr_tpu.train.trainer import Trainer, latest_checkpoint, restore_checkpoint
from lfsr_tpu.utils import create_dirs

ROOT = Path("/tmp/lfsr_train_demo")
cfg = Config(
    model_name="LFMambaX", scale_factor=4,
    path_for_train=str(ROOT / "data_for_train"),
    path_for_test=str(ROOT / "data_for_test"),
    path_log=str(ROOT / "log"),
    batch_size=4, mesh_shape=(1,),
)
_, ckpt_dir, _ = create_dirs(cfg)
ck = latest_checkpoint(ckpt_dir)
tr = Trainer(cfg, 48)
state = tr.init_state(jax.random.key(0), np.zeros((1, 160, 160, 1), np.float32))
state, epoch = restore_checkpoint(ck, state)
print(f"checkpoint epoch {epoch}", flush=True)
model = registry.get_model(cfg)
scenes = load_test_scenes(cfg.path_for_test, 5, 4, "ALL", tag=cfg.task_tag())["SynthVal"]

for pad in (0, 4, 8, 12, 16):
    ps_, ss_, ts = [], [], []
    for sc in scenes:
        h0 = sc.lr_y.shape[0] // 5
        w0 = sc.lr_y.shape[1] // 5
        t0 = time.perf_counter()
        views = sr_scene(
            model.apply, state.variables, jnp.asarray(sc.lr_y),
            ang=5, scale=4, patch=max(h0, w0), stride=max(h0, w0),
            minibatch=cfg.minibatch_for_test, h0=h0, w0=w0,
            whole_pad=pad, whole=True,
        )
        p, s = _score_views(sc, views, 5, 5, 4, False)
        ts.append(time.perf_counter() - t0)
        ps_.append(p); ss_.append(s)
    print(
        f"whole pad={pad:2d}: PSNR {np.mean(ps_):.4f}  SSIM {np.mean(ss_):.5f}"
        f"  (last wall {ts[-1]*1e3:.0f} ms)",
        flush=True,
    )
