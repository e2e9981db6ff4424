#!/usr/bin/env python
"""Evaluation entry point (reference: test.py:10-101).

Loads the latest (or given) checkpoint, runs batched tiled SR over every
test set, writes per-scene PSNR/SSIM to evaluation.csv (+.xls when xlwt
exists) and optionally the 25 per-view BMPs per scene.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lfsr_tpu.cli import build_parser, config_from_args
from lfsr_tpu.data.datasets import load_test_scenes
from lfsr_tpu.models import registry
from lfsr_tpu.ops.color import ycbcr2rgb
from lfsr_tpu.tools.submission import save_scene_views
from lfsr_tpu.train.trainer import Trainer, latest_checkpoint, restore_checkpoint
from lfsr_tpu.train.evaluate import evaluate_scene
from lfsr_tpu.utils import Logger, MetricSheet, create_dirs


def views_to_rgb_uint8(sr_views: np.ndarray, sr_cbcr: np.ndarray, ang: int) -> np.ndarray:
    """Recompose YCbCr -> RGB per view (train.py:329-344 semantics).

    sr_views: [U, V, h, w] Y; sr_cbcr: SAI [A*h, A*w, 2].
    """
    h, w = sr_views.shape[2:]
    cb = sr_cbcr.reshape(ang, h, ang, w, 2).transpose(0, 2, 1, 3, 4)
    ycc = np.concatenate([np.asarray(sr_views)[..., None], cb], axis=-1)
    rgb = np.clip(ycbcr2rgb(ycc.astype(np.float64)), 0, 1)
    # Truncation (not rounding) matches the reference byte-for-byte:
    # (ycbcr2rgb(...).clip(0,1)*255).astype('uint8') at train.py:333.
    return (rgb * 255).astype(np.uint8)


def main(cfg, ckpt_path: str | None = None, save_views: bool = True):
    log_dir, ckpt_dir, results_dir = create_dirs(cfg)
    log = Logger(log_dir, cfg.model_name + "_test")

    test_sets = load_test_scenes(cfg.path_for_test, cfg.angRes, cfg.scale_factor, cfg.data_name, tag=cfg.task_tag())
    model = registry.get_model(cfg)
    tr = Trainer(cfg, steps_per_epoch=1)
    state = tr.init_state(jax.random.key(0), np.zeros((1, cfg.angRes * 32, cfg.angRes * 32, 1), np.float32))
    path = ckpt_path or latest_checkpoint(ckpt_dir)
    if path is not None:
        state, epoch = restore_checkpoint(path, state)
        log(f"loaded checkpoint {path} (epoch {epoch})")
    else:
        log("WARNING: no checkpoint found — evaluating random init")

    from lfsr_tpu.parallel.mesh import make_mesh

    # mirror the trainer: mesh_shape=None means "all local devices", so
    # build the mesh unconditionally and shard eval whenever it is >1 chip
    mesh = make_mesh(cfg)
    if mesh.devices.size <= 1:
        mesh = None
    sheet = MetricSheet()
    for name, scenes in test_sets.items():
        per_scene = []
        for sc in scenes:
            p, s, sr_views = evaluate_scene(
                model.apply, state.variables, sc, cfg, mesh=mesh
            )
            per_scene.append((sc.name, p, s))
            log(f"{name}/{sc.name}: PSNR {p:.3f} SSIM {s:.4f}")
            if save_views:
                rgb = views_to_rgb_uint8(np.asarray(sr_views), sc.sr_cbcr, cfg.angRes)
                save_scene_views(results_dir / name / sc.name, rgb)
        sheet.add_set(name, per_scene)
        log(f"{name} average: PSNR {np.mean([x[1] for x in per_scene]):.3f} "
            f"SSIM {np.mean([x[2] for x in per_scene]):.4f}")
    sheet.save(results_dir / "evaluation")
    log("evaluation complete")


if __name__ == "__main__":
    p = build_parser()
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--no_save_views", action="store_true")
    args = p.parse_args()
    main(config_from_args(args), args.ckpt, not args.no_save_views)
