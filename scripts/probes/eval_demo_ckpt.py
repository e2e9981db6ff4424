"""Evaluate the train_demo checkpoint on the held-out synthetic scenes."""
import numpy as np
from pathlib import Path
from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import load_test_scenes
from lfsr_tpu.models import registry
from lfsr_tpu.train.evaluate import evaluate_scene
from lfsr_tpu.train.trainer import Trainer, latest_checkpoint, restore_checkpoint
import jax

ROOT = Path("/tmp/lfsr_train_demo")
cfg = Config(
    model_name="LFMambaX", scale_factor=4,
    path_for_train=str(ROOT / "data_for_train"),
    path_for_test=str(ROOT / "data_for_test"),
    path_log=str(ROOT / "log"),
    batch_size=4, mesh_shape=(1,),
)
from lfsr_tpu.utils import create_dirs
_, ckpt_dir, _ = create_dirs(cfg)
ck = latest_checkpoint(ckpt_dir)
print("checkpoint:", ck, flush=True)
tr = Trainer(cfg, 48)
state = tr.init_state(jax.random.key(0), np.zeros((1, 160, 160, 1), np.float32))
state, epoch = restore_checkpoint(ck, state)
print("epoch:", epoch, flush=True)
model = registry.get_model(cfg)
sets = load_test_scenes(cfg.path_for_test, 5, 4, "ALL", tag=cfg.task_tag())
ps, ss = [], []
for sc in sets["SynthVal"]:
    p, s, _ = evaluate_scene(model.apply, state.variables, sc, cfg)
    ps.append(p); ss.append(s)
    print(f"  {sc.name}: PSNR {p:.3f} SSIM {s:.4f}", flush=True)
print(f"FINAL: PSNR {np.mean(ps):.3f} SSIM {np.mean(ss):.4f} (bicubic 26.218 / 0.663)", flush=True)
