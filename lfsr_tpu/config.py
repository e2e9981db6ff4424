"""Frozen configuration object for the whole framework.

Replaces the reference's global argparse singleton (option.py:36-47,
imported at module load by utils/utils.py:8). Here configuration is an
explicit, immutable value passed to every constructor, which keeps model
construction pure and jit-friendly.

Derived fields mirror option.py:40-46: for the SR task ``angRes_in ==
angRes_out == angRes`` and tiled evaluation uses 32-pixel patches with
stride 16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # Task ------------------------------------------------------------------
    task: str = "SR"  # 'SR' (spatial) or 'RE' (angular reconstruction)
    angRes: int = 5   # input angular resolution (angRes_in)
    # RE task only: output angular resolution (option.py task='RE' path)
    angRes_out_re: Optional[int] = None
    scale_factor: int = 4

    # Model -----------------------------------------------------------------
    model_name: str = "LFMambaX"
    # Per-model keyword overrides (channels, depth, ...). Models read these
    # with ``cfg.model_kwargs.get(...)`` defaults, like the reference's
    # getattr(args, ..., default) pattern (MyEfficientLFNetV8.py:875-881).
    model_kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    # Data ------------------------------------------------------------------
    data_name: str = "ALL"
    path_for_train: str = "./data_for_train/"
    path_for_test: str = "./data_for_test/"
    path_log: str = "./log/"
    patch_size_for_train: int = 32  # LR patch edge per view during training

    # Optimization (train.py:98-127) -----------------------------------------
    batch_size: int = 4
    lr: float = 2e-4
    weight_decay: float = 1e-4
    epochs: int = 51
    # None derives the reference recipe min(5, epochs // 10) (train.py:109).
    warmup_epochs: Optional[int] = None
    eval_every: int = 5  # validation cadence in epochs (train.py:177)
    min_lr: float = 1e-6
    grad_clip_norm: float = 1.0
    compute_dtype: str = "bfloat16"  # activations; params stay float32
    seed: int = 0
    # In-step flip/transpose augmentation (utils_datasets.py:155-165);
    # off for deterministic parity harnesses.
    augment: bool = True

    # Masked angular pre-training (utils/masked_pretraining.py:174-218) ------
    use_masked_pretrain: bool = True
    mask_start_ratio: float = 0.1
    mask_end_ratio: float = 0.3
    mask_warmup_epochs: int = 20
    mask_strategy: str = "random"

    # Tiled evaluation (option.py:40-46) --------------------------------------
    patch_size_for_test: int = 32
    stride_for_test: int = 16
    minibatch_for_test: int = 2  # patches per device step (reference used 1); TPU sweep: 2 > 4 > 8 > 1 > 16 > 32 scenes/s (PERF.md)
    # Process each scene as ONE un-tiled SAI mosaic instead of the
    # reference's overlapping 32/16 patch grid. The reference tiles to fit
    # GPU memory; patch 32 / stride 16 recomputes every pixel 4x. On TPU
    # the fully-convolutional models run the whole scene in one call —
    # measured 2.4x scene throughput for the flagship at equal-or-better
    # PSNR (no seams, full receptive field; PERF.md round 3). Models whose
    # geometry is baked to the 160x160 SAI patch keep tiled eval.
    # None = auto: defer to the model registry's per-model capability
    # (registry.whole_scene_default); True/False forces the mode.
    whole_scene_for_test: Optional[bool] = None
    # Mirror-extend each view by this many LR pixels before an un-tiled
    # call (cropped back after). Tiled eval gives border patches a
    # symmetric continuation via lf_divide's ImageExtend; without this the
    # raw borders cost -0.036 dB on the trained-checkpoint gate, with
    # pad=8 whole-scene PSNR is >= tiled (PERF.md round-3 pad sweep).
    whole_scene_pad: int = 8
    # scenes per whole-scene dispatch (separate from the tiled patch
    # minibatch: tiled eval prefers 2, scene batching 4 — r4 sweep:
    # mb4 3.807 vs mb2 3.717 scenes/s, both NTIRE geometries verified
    # to fit HBM at 4)
    whole_scene_minibatch: int = 4
    # EPSW (Enhanced Position-Sensitive Windowing, MyEfficientLFNetV4_3.py:
    # 148-216): blend overlapping SR patches with a Gaussian weight centred
    # on each patch instead of the hard center crop. Only meaningful for
    # tiled eval (whole-scene mode has no seams to blend). epsw_sigma is in
    # SR pixels; None = the reference's input_patch/6 convention (V4_3:166).
    epsw_for_test: bool = False
    epsw_sigma: Optional[float] = None

    # Parallelism -------------------------------------------------------------
    mesh_shape: Optional[Tuple[int, ...]] = None  # None => all local devices
    mesh_axis_names: Tuple[str, ...] = ("data",)

    # Derived ----------------------------------------------------------------
    @property
    def angRes_in(self) -> int:
        return self.angRes

    @property
    def angRes_out(self) -> int:
        if self.task == "RE" and self.angRes_out_re:
            return self.angRes_out_re
        return self.angRes

    def mk(self, key: str, default: Any) -> Any:
        """Look up a per-model hyperparameter override."""
        return self.model_kwargs.get(key, default)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def task_tag(self) -> str:
        """Directory tag, e.g. 'SR_5x5_4x' or 'RE_2x2_5x5'
        (utils/utils.py:59-78, utils_datasets.py:20-27 schema)."""
        if self.task == "RE":
            return (
                f"RE_{self.angRes}x{self.angRes}_"
                f"{self.angRes_out}x{self.angRes_out}"
            )
        return f"{self.task}_{self.angRes}x{self.angRes}_{self.scale_factor}x"
