"""Logger, per-scene metric sheet, and the log/ directory schema.

Mirrors the reference conventions so downstream scripts keep working:
- directory layout ``log/SR_AxA_sx/<data>/<model>/{checkpoints,results}``
  (utils/utils.py:59-78);
- a per-scene PSNR/SSIM sheet with per-dataset averages; the reference
  wrote xlwt ``.xls`` (utils/utils.py:14-44) — here it's a CSV with the
  same columns (Datasets, Scenes, PSNR, SSIM), plus ``.xls`` when xlwt
  happens to be installed.
"""

from __future__ import annotations

import csv
import logging
import sys
from pathlib import Path

from lfsr_tpu.config import Config


def create_dirs(cfg: Config):
    base = Path(cfg.path_log) / cfg.task_tag() / cfg.data_name / cfg.model_name
    ckpt = base / "checkpoints"
    results = base / "results"
    for d in (base, ckpt, results):
        d.mkdir(parents=True, exist_ok=True)
    return base, ckpt, results


class Logger:
    def __init__(self, log_dir: Path, name: str):
        self._logger = logging.getLogger(f"lfsr_tpu.{name}")
        self._logger.setLevel(logging.INFO)
        self._logger.handlers.clear()
        fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        fh = logging.FileHandler(Path(log_dir) / f"{name}.txt")
        fh.setFormatter(fmt)
        self._logger.addHandler(fh)
        self._logger.propagate = False

    def log(self, msg: str):
        self._logger.info(msg)
        print(msg, flush=True)

    __call__ = log


class MetricSheet:
    """Per-scene PSNR/SSIM accumulator -> CSV (and .xls if available)."""

    def __init__(self):
        self.rows: list[tuple[str, str, float, float]] = []

    def add(self, dataset: str, scene: str, psnr: float, ssim: float):
        self.rows.append((dataset, scene, psnr, ssim))

    def add_set(self, dataset: str, per_scene):
        for name, p, s in per_scene:
            self.add(dataset, name, p, s)
        import numpy as np

        self.add(
            dataset,
            "average",
            float(np.mean([x[1] for x in per_scene])),
            float(np.mean([x[2] for x in per_scene])),
        )

    def save(self, path: str | Path):
        path = Path(path)
        with open(path.with_suffix(".csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Datasets", "Scenes", "PSNR", "SSIM"])
            for ds, sc, p, s in self.rows:
                w.writerow([ds, sc, f"{p:.6f}", f"{s:.6f}"])
        try:  # optional legacy .xls for drop-in compatibility
            import xlwt

            wb = xlwt.Workbook()
            sh = wb.add_sheet("sheet1", cell_overwrite_ok=True)
            for j, col in enumerate(["Datasets", "Scenes", "PSNR", "SSIM"]):
                sh.write(0, j, col)
            for i, (ds, sc, p, s) in enumerate(self.rows, start=1):
                sh.write(i, 0, ds)
                sh.write(i, 1, sc)
                sh.write(i, 2, f"{p:.6f}")
                sh.write(i, 3, f"{s:.6f}")
            wb.save(str(path.with_suffix(".xls")))
        except ImportError:
            pass
