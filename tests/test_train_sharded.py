"""Multi-chip training exactness: one production train step on the
virtual 8-device CPU mesh must match the single-device step (updated
params, not just a finite loss — VERDICT r2 missing #4; mirrors
tests/test_eval_sharded.py for the gradient path)."""

import numpy as np
import jax
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays
from lfsr_tpu.train.trainer import Trainer

ANG, SCALE, H0 = 5, 2, 8
RNG = np.random.default_rng(33)


def _run_epoch(n_devices: int, data, cfg):
    tr = Trainer(
        cfg.replace(mesh_shape=(n_devices,)),
        steps_per_epoch=2,
        devices=jax.devices()[:n_devices],
    )
    state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])
    state, metrics = tr.run_epoch(state, data, epoch=1, key=jax.random.key(7))
    return state, metrics


@pytest.mark.slow
def test_train_step_sharded_matches_single_device():
    cfg = Config(
        model_name="DistgSSR",
        scale_factor=SCALE,
        compute_dtype="float32",
        batch_size=8,
        epochs=2,
        warmup_epochs=1,
        use_masked_pretrain=True,
        mask_start_ratio=0.2,
        model_kwargs={"channels": 8, "n_groups": 1, "n_blocks": 1},
    )
    n = 16
    data = TrainArrays(
        lr=RNG.random((n, ANG * H0, ANG * H0)).astype(np.float32),
        hr=RNG.random((n, ANG * H0 * SCALE, ANG * H0 * SCALE)).astype(np.float32),
    )
    s1, m1 = _run_epoch(1, data, cfg)
    s8, m8 = _run_epoch(8, data, cfg)

    assert abs(m1["loss"] - m8["loss"]) < 1e-6, (m1, m8)
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s1.params, s8.params,
    )
    worst = max(jax.tree.leaves(deltas))
    # only f32 reduction-order differences (the psum) may remain
    assert worst < 1e-6, f"sharded-vs-single param max|delta| = {worst:.3e}"
