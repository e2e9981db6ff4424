"""Whole-scene (un-tiled) evaluation path (Config.whole_scene_for_test).

The reference always evaluates through the overlapping 32/16 patch grid
(train.py:307-313) because the torch models won't fit a whole scene on
the GPU; on TPU one un-tiled call removes the 4x overlap recompute. These
tests pin the layout algebra of the new branch: it must equal (a) a
direct model application, and (b) the tiled path exactly for a spatially
local model (where overlap stitching is a no-op semantically).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TestScene
from lfsr_tpu.ops.layout import sai_to_views
from lfsr_tpu.train.evaluate import evaluate_scene, sr_scene

ANG, SCALE = 5, 4


def _pointwise_apply(params, x):
    """Stand-in model: pixel-local 4x upsample of an SAI mosaic.

    Zero spatial context means tiled and whole-scene outputs must be
    bit-identical, isolating the stitching/layout algebra."""
    b, H, W, _ = x.shape
    # per-view nearest upsample (SAI-level repeat would mix views)
    v = x[:, :, :, 0].reshape(b, ANG, H // ANG, ANG, W // ANG)
    v = jnp.repeat(jnp.repeat(v, SCALE, axis=2), SCALE, axis=4)
    return (0.5 * v.reshape(b, ANG * (H // ANG) * SCALE,
                            ANG * (W // ANG) * SCALE) + 0.25)[..., None]


def test_whole_scene_equals_direct_apply():
    h0 = 16
    lr = jnp.asarray(
        np.random.default_rng(0).random((ANG * h0, ANG * h0)), jnp.float32
    )
    out = sr_scene(
        _pointwise_apply, None, lr, ang=ANG, scale=SCALE, patch=h0,
        stride=h0, minibatch=1, h0=h0, w0=h0, whole=True,
    )
    direct = sai_to_views(_pointwise_apply(None, lr[None, ..., None])[0, ..., 0], ANG)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(direct))
    assert out.shape == (ANG, ANG, h0 * SCALE, h0 * SCALE)


def test_whole_scene_matches_tiled_for_local_model():
    h0 = 16
    lr = jnp.asarray(
        np.random.default_rng(1).random((ANG * h0, ANG * h0)), jnp.float32
    )
    whole = sr_scene(
        _pointwise_apply, None, lr, ang=ANG, scale=SCALE, patch=h0,
        stride=h0, minibatch=1, h0=h0, w0=h0, whole=True,
    )
    tiled = sr_scene(
        _pointwise_apply, None, lr, ang=ANG, scale=SCALE, patch=8,
        stride=4, minibatch=4, h0=h0, w0=h0,
    )
    np.testing.assert_allclose(np.asarray(whole), np.asarray(tiled), atol=1e-6)


def test_evaluate_scene_whole_flag():
    h0 = 16
    rng = np.random.default_rng(2)
    lr = rng.random((ANG * h0, ANG * h0)).astype(np.float32)
    hr = rng.random((ANG * h0 * SCALE, ANG * h0 * SCALE)).astype(np.float32)
    sc = TestScene(
        name="t", dataset="synth", lr_y=lr, hr_y=hr,
        sr_cbcr=np.zeros((*hr.shape, 2), np.float32),
    )
    cfg = Config(whole_scene_for_test=True, patch_size_for_test=8,
                 stride_for_test=4)
    p_w, s_w, views_w = evaluate_scene(_pointwise_apply, None, sc, cfg)
    cfg_t = cfg.replace(whole_scene_for_test=False, minibatch_for_test=4)
    p_t, s_t, views_t = evaluate_scene(_pointwise_apply, None, sc, cfg_t)
    np.testing.assert_allclose(
        np.asarray(views_w), np.asarray(views_t), atol=1e-6
    )
    assert abs(p_w - p_t) < 1e-4 and abs(s_w - s_t) < 1e-4


def test_whole_scene_pad_identity_for_local_model():
    """whole_pad mirror-extends each view then crops the SR back; for a
    pixel-local model the padded and unpadded outputs are identical, so
    this isolates the pad/crop index algebra (incl. odd geometries that
    fall outside the Pallas kernels' alignment envelope)."""
    for h0, w0 in ((16, 16), (30, 26)):
        lr = jnp.asarray(
            np.random.default_rng(1).random((ANG * h0, ANG * w0)), jnp.float32
        )
        kw = dict(ang=ANG, scale=SCALE, patch=max(h0, w0), stride=max(h0, w0),
                  minibatch=1, h0=h0, w0=w0, whole=True)
        base = sr_scene(_pointwise_apply, None, lr, **kw)
        padded = sr_scene(_pointwise_apply, None, lr, whole_pad=8, **kw)
        np.testing.assert_array_equal(np.asarray(padded), np.asarray(base))


def test_whole_scene_batch_single_device_matches_per_scene():
    """sr_scenes_whole (minibatched scene dispatches on one device) must
    equal the per-scene whole path exactly, incl. ragged tail chunks."""
    from lfsr_tpu.train.evaluate import sr_scenes_whole

    h0 = 16
    sais = jnp.asarray(
        np.random.default_rng(3).random((5, ANG * h0, ANG * h0)), jnp.float32
    )
    batched = np.asarray(
        sr_scenes_whole(
            _pointwise_apply, None, sais, ang=ANG, ang_out=ANG,
            scale=SCALE, whole_pad=8, minibatch=2,
        )
    )
    for i in range(5):
        single = np.asarray(
            sr_scene(
                _pointwise_apply, None, sais[i], ang=ANG, scale=SCALE,
                patch=h0, stride=h0, minibatch=1, h0=h0, w0=h0,
                whole=True, whole_pad=8,
            )
        )
        np.testing.assert_array_equal(batched[i], single)


def test_whole_scene_pad_clamped_on_tiny_scenes():
    """Scenes whose LR view extent is smaller than pad+8 must not crash
    inside jit (symmetric pad > extent raises); the effective pad is
    clamped — to zero here (h0=6 < 8) — and the output stays the
    un-padded result for a pixel-local model (ADVICE r3)."""
    for h0, w0 in ((6, 6), (10, 9)):
        lr = jnp.asarray(
            np.random.default_rng(4).random((ANG * h0, ANG * w0)), jnp.float32
        )
        kw = dict(ang=ANG, scale=SCALE, patch=max(h0, w0), stride=max(h0, w0),
                  minibatch=1, h0=h0, w0=w0, whole=True)
        base = sr_scene(_pointwise_apply, None, lr, **kw)
        padded = sr_scene(_pointwise_apply, None, lr, whole_pad=8, **kw)
        assert padded.shape == (ANG, ANG, h0 * SCALE, w0 * SCALE)
        np.testing.assert_array_equal(np.asarray(padded), np.asarray(base))


def test_epsw_sigma_zero_rejected():
    """An explicit epsw_sigma=0.0 is a config error, not a request for
    the patch/6 default (ADVICE r3)."""
    import pytest as _pytest

    h0 = 16
    lr = jnp.asarray(
        np.random.default_rng(5).random((ANG * h0, ANG * h0)), jnp.float32
    )
    with _pytest.raises(ValueError, match="epsw_sigma"):
        sr_scene(
            _pointwise_apply, None, lr, ang=ANG, scale=SCALE, patch=8,
            stride=4, minibatch=4, h0=h0, w0=h0, integrate="gaussian",
            integrate_sigma=0.0,
        )
