"""Trainer: jitted data-parallel train step, schedule, checkpointing.

Replaces the reference training loop (train.py:20-282) with a TPU-native
one:
- AdamW(lr 2e-4, wd 1e-4) + linear warm-up -> cosine to 1e-6
  (train.py:98-124), as one optax schedule over steps;
- global-norm clip 1.0 (train.py:266) in the optax chain;
- NaN-batch skip (train.py:260-262) via optax.apply_if_finite;
- AMP autocast+GradScaler (train.py:127) becomes bf16 activations with
  f32 params/optimizer — no loss scaling needed on TPU;
- augmentation + masked pre-training + per-step PSNR all run inside the
  single jitted step (the reference computed metrics per step on CPU,
  train.py:273);
- checkpoints carry params AND optimizer state + epoch + PRNG key via
  orbax (the reference dropped optimizer state, SURVEY.md §5);
- parallelism: batch sharded over the 1-D ``data`` mesh, params
  replicated; XLA emits the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays, augment_batch, batch_indices
from lfsr_tpu.models import registry
from lfsr_tpu.ops.layout import sai_to_views
from lfsr_tpu.ops.metrics import lf_metrics, psnr
from lfsr_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from lfsr_tpu.train import masking


class TrainState(struct.PyTreeNode):
    params: Any          # trainable collection only
    model_state: Any     # non-trainable collections (e.g. batch_stats)
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        """Full variables dict for model.apply."""
        return {"params": self.params, **(self.model_state or {})}


def make_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    # Reference recipe (train.py:109-124): warmup = min(5, epochs // 10)
    # epochs of LinearLR from lr*0.01, then cosine to 1e-6.
    warmup_epochs = cfg.warmup_epochs
    if warmup_epochs is None:
        warmup_epochs = min(5, cfg.epochs // 10)
    warmup = max(1, warmup_epochs * steps_per_epoch)
    total = max(warmup + 1, cfg.epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=cfg.lr * 0.01,
        peak_value=cfg.lr,
        warmup_steps=warmup,
        decay_steps=total,
        end_value=cfg.min_lr,
    )


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            make_schedule(cfg, steps_per_epoch), weight_decay=cfg.weight_decay
        ),
    )
    # NaN-loss batches are skipped, mirroring train.py:260-262.
    return optax.apply_if_finite(tx, max_consecutive_errors=100)


@dataclasses.dataclass
class Trainer:
    cfg: Config
    steps_per_epoch: int
    devices: Any = None  # default: all local devices

    def __post_init__(self):
        cfg = self.cfg
        self.model = registry.get_model(cfg)
        self.loss_fn = registry.get_loss(cfg)
        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        self.mesh = make_mesh(cfg, devices=self.devices)
        self._bs = batch_sharding(self.mesh)
        self._rep = replicated(self.mesh)
        self._step_fns: dict[int, Callable] = {}

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array, sample_lr: np.ndarray) -> TrainState:
        x = jnp.zeros((1, *sample_lr.shape[1:]), jnp.float32)
        variables = dict(jax.jit(self.model.init)(key, x))
        params = variables.pop("params")
        params = jax.device_put(params, self._rep)
        model_state = jax.device_put(variables, self._rep)
        opt_state = jax.device_put(self.tx.init(params), self._rep)
        return TrainState(
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _build_step(self, mask_k: int, gather: bool = False):
        cfg = self.cfg
        model, loss_fn, tx = self.model, self.loss_fn, self.tx
        ang = cfg.angRes
        bs = self._bs

        def step(state: TrainState, lr, hr, key, sracm_ratio):
            if gather:
                # device-resident dataset fast path: lr/hr arrive as the
                # FULL train arrays (staged on device once per epoch set),
                # key carries (prng, idx) — the batch gather runs on
                # device, so no per-step H2D at all (the host->device
                # link, ~0.9 s/step over the axon tunnel for a batch-8
                # SAI-160 batch, drops out of the step entirely)
                key, idx = key
                lr = jax.lax.with_sharding_constraint(
                    jnp.take(lr, idx, axis=0), bs
                )
                hr = jax.lax.with_sharding_constraint(
                    jnp.take(hr, idx, axis=0), bs
                )
            kaug, kmask, ksr, kdrop = jax.random.split(key, 4)
            lr_a, hr_a = (
                augment_batch(kaug, lr, hr) if cfg.augment else (lr, hr)
            )
            x = lr_a[..., None]
            y = hr_a[..., None]
            if cfg.use_masked_pretrain and mask_k > 0:
                x = masking.mask_views(kmask, x, ang, mask_k, cfg.mask_strategy)
                x = masking.sracm(ksr, x, ang, sracm_ratio)

            has_bn = bool(state.model_state)

            def compute_loss(params):
                variables = {"params": params, **(state.model_state or {})}
                kwargs = {}
                if cfg.model_name in _TRAIN_FLAG_MODELS:
                    kwargs = dict(train=True, rngs={"dropout": kdrop})
                if has_bn:
                    sr, new_model_state = model.apply(
                        variables, x, mutable=list(state.model_state), **kwargs
                    )
                else:
                    sr = model.apply(variables, x, **kwargs)
                    new_model_state = state.model_state
                return loss_fn(sr, y), (sr, new_model_state)

            (loss, (sr, new_model_state)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params,
                model_state=new_model_state,
                opt_state=opt_state,
                step=state.step + 1,
            )
            # per-view PSNR + SSIM, matching the reference's per-iter
            # cal_metrics (train.py:273) but on-device inside the step
            ao = cfg.angRes_out
            if y.shape[1] // ao >= 11 and y.shape[2] // ao >= 11:
                batch_psnr, batch_ssim = lf_metrics(y[..., 0], sr[..., 0], ao)
            else:
                # views smaller than the 11-tap SSIM window (tiny smoke
                # shapes): per-view PSNR only
                yv = sai_to_views(y[..., 0], ao)
                sv = sai_to_views(sr[..., 0], ao)
                batch_psnr = jnp.mean(psnr(yv, sv))
                batch_ssim = jnp.float32(0.0)
            return new_state, {
                "loss": loss, "psnr": batch_psnr, "ssim": batch_ssim,
            }

        return jax.jit(step, donate_argnums=(0,))

    def step_fn(self, mask_k: int, gather: bool = False) -> Callable:
        k = (mask_k, gather)
        if k not in self._step_fns:
            self._step_fns[k] = self._build_step(mask_k, gather)
        return self._step_fns[k]

    # ------------------------------------------------------------------
    def _data_on_device(self, data) -> bool:
        """Stage the full train arrays on device (replicated) when they
        fit comfortably; cached per data object. The 144-scene NTIRE
        training set is ~2 GB as f32 SAI mosaics — far under one v5e's
        16 GB HBM even next to batch-8 training state."""
        limit = float(self.cfg.mk("device_data_gb", 4.0)) * 1e9
        nbytes = data.lr.nbytes + data.hr.nbytes
        if nbytes > limit:
            return False
        key = id(data)
        if getattr(self, "_ddata_key", None) != key:
            self._ddata = (
                jax.device_put(data.lr, self._rep),
                jax.device_put(data.hr, self._rep),
            )
            self._ddata_key = key
        return True

    # ------------------------------------------------------------------
    def run_epoch(
        self,
        state: TrainState,
        data: TrainArrays,
        epoch: int,
        key: jax.Array,
    ):
        cfg = self.cfg
        ratio = (
            masking.progressive_ratio(
                epoch, cfg.mask_start_ratio, cfg.mask_end_ratio, cfg.mask_warmup_epochs
            )
            if cfg.use_masked_pretrain
            else 0.0
        )
        mask_k = masking.num_masked_views(cfg.angRes, ratio) if ratio > 0 else 0

        kperm, kstep = jax.random.split(jax.random.fold_in(key, epoch))
        idx = batch_indices(kperm, len(data), cfg.batch_size, self.steps_per_epoch)

        metrics_acc: dict[str, list] = {}
        if self._data_on_device(data):
            # Device-resident fast path: the full train arrays live on
            # device (replicated); each step gathers its batch IN-jit, so
            # the only per-step H2D is a [B] int32 index vector. The
            # reference's DataLoader-worker pipeline (train.py:36-38)
            # exists to hide exactly this host->device traffic.
            fn = self.step_fn(mask_k, gather=True)
            lr_all, hr_all = self._ddata
            for i in range(self.steps_per_epoch):
                state, m = fn(
                    state, lr_all, hr_all,
                    (jax.random.fold_in(kstep, i), jnp.asarray(idx[i])),
                    jnp.float32(ratio),
                )
                for k, v in m.items():
                    metrics_acc.setdefault(k, []).append(v)
        else:
            fn = self.step_fn(mask_k)

            # One-batch-ahead prefetch: the host-side fancy-index gather +
            # device_put for step i+1 happen while the device runs step i,
            # so the chip never idles on H2D (the dispatch itself is async).
            def _prep(i):
                b = idx[i]
                return (
                    jax.device_put(data.lr[b], self._bs),
                    jax.device_put(data.hr[b], self._bs),
                )

            nxt = _prep(0)
            for i in range(self.steps_per_epoch):
                lr, hr = nxt
                state, m = fn(state, lr, hr, jax.random.fold_in(kstep, i), jnp.float32(ratio))
                if i + 1 < self.steps_per_epoch:
                    nxt = _prep(i + 1)
                for k, v in m.items():
                    metrics_acc.setdefault(k, []).append(v)
        out = {
            k: float(jnp.mean(jnp.stack(v))) for k, v in metrics_acc.items()
        }
        out["mask_ratio"] = ratio
        return state, out


# Models whose __call__ accepts (x, train) (dropout and/or batch norm).
_TRAIN_FLAG_MODELS = {
    "LFMambaX", "EfficientLFNetV2", "EfficientLFNetV3", "EfficientLFNetV64",
    "EfficientLFNetV6", "EfficientLFNetV6_1", "EfficientLFNetV6_3",
    "EfficientLFNetV6_5", "EfficientLFNetV7", "LF_DET",
}


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — full train state, unlike the reference which only
# stored params (train.py:165-174) and silently restarted the LR schedule.
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, epoch: int):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / f"epoch_{epoch:04d}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": state.params,
                "model_state": state.model_state,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step),
                "epoch": np.asarray(epoch),
            },
        )
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    d = Path(ckpt_dir)
    if not d.is_dir():
        return None
    cands = sorted(p for p in d.iterdir() if p.name.startswith("epoch_"))
    return cands[-1] if cands else None


def restore_checkpoint(path: str | Path, state: TrainState):
    import orbax.checkpoint as ocp

    template = {
        "params": state.params,
        "model_state": state.model_state,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute(), template)
    new_state = TrainState(
        params=restored["params"],
        model_state=restored["model_state"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )
    return new_state, int(restored["epoch"])
