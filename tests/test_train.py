"""End-to-end trainer tests on the 8-device CPU mesh: loss decreases,
masking behaves, checkpoints round-trip, tiled evaluation runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays
from lfsr_tpu.data.datasets import TestScene as LFScene
from lfsr_tpu.models import registry
from lfsr_tpu.train import masking
from lfsr_tpu.train.trainer import Trainer, save_checkpoint, restore_checkpoint, latest_checkpoint
from lfsr_tpu.train.evaluate import evaluate_scene

ANG, SCALE = 5, 2


def _synthetic_data(n=16, h0=8):
    rng = np.random.default_rng(0)
    hr = rng.random((n, ANG * h0 * SCALE, ANG * h0 * SCALE)).astype(np.float32)
    # LR = strided subsample (cheap, deterministic relationship)
    lr = hr[:, ::SCALE, ::SCALE].copy()
    return TrainArrays(lr=lr, hr=hr)


def _cfg(**kw):
    return Config(
        model_name="VDSR",
        scale_factor=SCALE,
        compute_dtype="float32",
        batch_size=8,
        epochs=2,
        warmup_epochs=1,
        lr=1e-3,
        use_masked_pretrain=False,
        model_kwargs={"n_layers": 2, "channels": 16},
        **kw,
    )


def test_train_loss_decreases(tmp_path):
    cfg = _cfg()
    data = _synthetic_data()
    tr = Trainer(cfg, steps_per_epoch=6)
    assert len(tr.mesh.devices.flatten()) == 8  # virtual CPU mesh
    state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])
    key = jax.random.key(1)
    state, m0 = tr.run_epoch(state, data, epoch=0, key=key)
    state, m1 = tr.run_epoch(state, data, epoch=1, key=key)
    assert np.isfinite(m0["loss"]) and np.isfinite(m1["loss"])
    assert m1["loss"] < m0["loss"], (m0, m1)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    data = _synthetic_data(8)
    tr = Trainer(cfg, steps_per_epoch=2)
    state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])
    state, _ = tr.run_epoch(state, data, epoch=0, key=jax.random.key(2))
    path = save_checkpoint(tmp_path, state, epoch=0)
    assert latest_checkpoint(tmp_path) == path

    fresh = tr.init_state(jax.random.key(9), data.lr[:1][..., None])
    restored, epoch = restore_checkpoint(path, fresh)
    assert epoch == 0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_views_zeroes_whole_views():
    key = jax.random.key(0)
    x = jnp.ones((2, ANG * 4, ANG * 4, 1))
    out = masking.mask_views(key, x, ANG, k=6, skip_prob=0.0)
    v = np.asarray(out).reshape(2, ANG, 4, ANG, 4)
    view_sums = v.sum(axis=(2, 4))  # [2, U, V]
    n_zero = int((view_sums[0] == 0).sum())
    assert n_zero == 6
    # center view never masked
    assert view_sums[0, ANG // 2, ANG // 2] > 0
    # same mask across batch
    np.testing.assert_array_equal(view_sums[0] == 0, view_sums[1] == 0)


def test_mask_views_skip_leaves_input():
    key = jax.random.key(0)
    x = jnp.ones((1, ANG * 4, ANG * 4, 1))
    out = masking.mask_views(key, x, ANG, k=6, skip_prob=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_sracm_angular_consistency():
    key = jax.random.key(3)
    x = jnp.ones((1, ANG * 8, ANG * 8, 1))
    out = np.asarray(masking.sracm(key, x, ANG, 0.4))[0, :, :, 0]
    views = out.reshape(ANG, 8, ANG, 8).transpose(0, 2, 1, 3)
    # every view has the identical spatial mask
    for u in range(ANG):
        for v in range(ANG):
            np.testing.assert_array_equal(views[u, v], views[0, 0])
    assert 0.3 < (out == 0).mean() < 0.5


def test_evaluate_scene_runs():
    cfg = _cfg().replace(minibatch_for_test=4)
    model = registry.get_model(cfg)
    h0 = 24
    rng = np.random.default_rng(4)
    lr = rng.random((ANG * h0, ANG * h0)).astype(np.float32)
    hr = rng.random((ANG * h0 * SCALE, ANG * h0 * SCALE)).astype(np.float32)
    scene = LFScene(name="t", dataset="d", lr_y=lr, hr_y=hr,
                      sr_cbcr=np.zeros((*hr.shape, 2), np.float32))
    params = model.init(jax.random.key(0), jnp.zeros((1, 160, 160, 1)))
    p, s, sr = evaluate_scene(model.apply, params, scene, cfg)
    assert sr.shape == (ANG, ANG, h0 * SCALE, h0 * SCALE)
    assert np.isfinite(p) and np.isfinite(s)


def test_evaluate_scene_re_task():
    """RE (angular reconstruction) eval path: 2x2 input views -> 5x5
    output views at spatial scale 1, metric excluding input positions."""
    from lfsr_tpu.config import Config
    from lfsr_tpu.train.evaluate import evaluate_scene

    rng = np.random.default_rng(5)
    ang_in, ang_out, h0 = 2, 5, 48
    hr_views = rng.random((ang_out, ang_out, h0, h0)).astype(np.float32)
    step = (ang_out - 1) // (ang_in - 1)
    lr_views = hr_views[::step, ::step]
    lr_sai = np.moveaxis(lr_views, 2, 1).reshape(ang_in * h0, ang_in * h0)
    hr_sai = np.moveaxis(hr_views, 2, 1).reshape(ang_out * h0, ang_out * h0)

    cfg = Config(task="RE", angRes=ang_in, angRes_out_re=ang_out,
                 compute_dtype="float32", minibatch_for_test=4)
    assert cfg.task_tag() == "RE_2x2_5x5"

    class FakeScene:
        name, dataset = "s", "d"
        lr_y, hr_y = lr_sai, hr_sai
        sr_cbcr = None

    # fake "model": replicate the mean input view to all 5x5 positions
    def apply_fn(params, x):
        b, H, W, c = x.shape
        p = H // ang_in
        views = x.reshape(b, ang_in, p, ang_in, p, c).transpose(0, 1, 3, 2, 4, 5)
        mean = views.mean(axis=(1, 2), keepdims=True)
        out = jnp.broadcast_to(mean, (b, ang_out, ang_out, p, p, c))
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, ang_out * p, ang_out * p, c)

    psnr, ssim, sr_views = evaluate_scene(apply_fn, {}, FakeScene, cfg)
    assert sr_views.shape == (ang_out, ang_out, h0, h0)
    assert np.isfinite(psnr) and np.isfinite(ssim)
    # random target: PSNR must be low but positive
    assert 0 < psnr < 20


@pytest.mark.slow
def test_device_resident_epoch_matches_host_fed():
    """The device-resident data fast path (full arrays staged once,
    in-jit batch gather) must produce EXACTLY the params and metrics of
    the host-fed prefetch path — same indices, same keys, same math."""
    data = _synthetic_data()
    cfg = _cfg().replace(use_masked_pretrain=True)

    def run(device_data_gb):
        c = cfg.replace(
            model_kwargs={**cfg.model_kwargs, "device_data_gb": device_data_gb}
        )
        tr = Trainer(c, steps_per_epoch=4)
        state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])
        state, m = tr.run_epoch(state, data, epoch=0, key=jax.random.key(5))
        return state, m

    s_dev, m_dev = run(4.0)     # fits -> device-resident path
    s_host, m_host = run(0.0)   # forced host-fed path
    for k in m_host:
        assert np.isclose(m_dev[k], m_host[k], rtol=0, atol=1e-6), (k, m_dev[k], m_host[k])
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s_dev.params, s_host.params,
    )
    assert max(jax.tree.leaves(deltas)) == 0.0
