#!/usr/bin/env python
"""Training entry point (reference: train.py:20-282, flag-compatible CLI).

Pipeline: load the in-memory patch dataset -> jitted data-parallel epochs
(AdamW + warmup->cosine, grad-clip, NaN-skip, masked-angular curriculum)
-> per-epoch orbax checkpoint (full train state) -> tiled whole-scene
validation every 5 epochs with per-scene PSNR/SSIM sheets.
"""

from __future__ import annotations

import jax

from lfsr_tpu.cli import build_parser, config_from_args
from lfsr_tpu.data.datasets import load_train_set, load_test_scenes
from lfsr_tpu.models import registry
from lfsr_tpu.train.trainer import (
    Trainer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from lfsr_tpu.train.evaluate import evaluate_sets
from lfsr_tpu.utils import Logger, MetricSheet, create_dirs


def main(cfg):
    eval_every = cfg.eval_every
    log_dir, ckpt_dir, results_dir = create_dirs(cfg)
    log = Logger(log_dir, cfg.model_name)
    log(f"devices: {jax.devices()}")
    log(f"config: {cfg}")

    data = load_train_set(cfg.path_for_train, cfg.angRes, cfg.scale_factor, cfg.data_name, tag=cfg.task_tag())
    log(f"train items: {len(data)}  LR {data.lr.shape}  HR {data.hr.shape}")
    try:
        test_sets = load_test_scenes(cfg.path_for_test, cfg.angRes, cfg.scale_factor, cfg.data_name, tag=cfg.task_tag())
    except FileNotFoundError:
        test_sets = {}

    steps_per_epoch = max(1, len(data) // cfg.batch_size)
    tr = Trainer(cfg, steps_per_epoch)
    key = jax.random.key(cfg.seed)
    state = tr.init_state(key, data.lr[:1][..., None])

    start_epoch = 0
    resume = latest_checkpoint(ckpt_dir)
    if resume is not None:
        state, last = restore_checkpoint(resume, state)
        start_epoch = last + 1
        log(f"resumed from {resume} (epoch {last})")

    for epoch in range(start_epoch, cfg.epochs):
        state, metrics = tr.run_epoch(state, data, epoch, key)
        log(
            f"epoch {epoch:03d}: loss {metrics['loss']:.5f} "
            f"psnr {metrics['psnr']:.3f} ssim {metrics['ssim']:.4f} "
            f"mask {metrics['mask_ratio']:.2f}"
        )
        save_checkpoint(ckpt_dir, state, epoch)

        # validate every `eval_every` epochs (first at epoch eval_every-1,
        # matching the reference's every-5-epochs cadence) and at the end
        if test_sets and ((epoch + 1) % eval_every == 0 or epoch == cfg.epochs - 1):
            model = tr.model
            results = evaluate_sets(model.apply, state.variables, test_sets, cfg, log,
                                    mesh=tr.mesh if tr.mesh.devices.size > 1 else None)
            sheet = MetricSheet()
            for name, r in results.items():
                sheet.add_set(name, r["scenes"])
            sheet.save(results_dir / f"evaluation_epoch{epoch:03d}")
    log("training complete")
    return state


if __name__ == "__main__":
    args = build_parser().parse_args()
    main(config_from_args(args))
