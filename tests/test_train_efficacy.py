"""Training-efficacy regression pin (VERDICT r2 next-round #1 tail).

Scaled-down deterministic twin of scripts/probes/train_demo.py: synthetic
light fields with real angular structure (per-view sub-pixel disparity
shifts of layered textures — the correlation LF SR models exploit), the
flagship LFMambaX trained through the production jitted step, evaluated
through the production tiled path, and the trained-vs-bicubic PSNR delta
asserted against a pinned threshold. A fixed seed makes regressions in
the train step, loss, schedule, or eval path show up as a PSNR drop.

The full-scale demo (48 scenes, 56 epochs on a real chip) measured
+0.17 dB over bicubic at the best epoch (PERF.md); this toy pin runs in
minutes on the CPU mesh and asserts a smaller but strictly positive
margin, measured on the pinned seed.
"""

import numpy as np
import pytest
import jax

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays, TestScene
from lfsr_tpu.models import registry
from lfsr_tpu.ops.metrics import lf_metrics
from lfsr_tpu.ops.resize import imresize
from lfsr_tpu.train.evaluate import evaluate_scene
from lfsr_tpu.train.trainer import Trainer

ANG, SCALE, HRS = 5, 4, 32  # HR view 32 -> LR view 8 (SAI 40 -> 160)


def _texture(rng, size, scale_px):
    coarse = rng.standard_normal((max(2, size // scale_px),) * 2)
    t = imresize(coarse, out_shape=(size, size))
    return (t - t.min()) / (t.max() - t.min() + 1e-9)


def _shift(img, dy, dx):
    H, W = img.shape
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    F = np.fft.fft2(img) * np.exp(-2j * np.pi * (fy * dy + fx * dx))
    return np.real(np.fft.ifft2(F))


def _scene(rng, size=HRS, n_layers=3):
    texs = [_texture(rng, size, int(rng.integers(2, 6))) for _ in range(n_layers)]
    masks = [np.ones((size, size))] + [
        (_texture(rng, size, int(rng.integers(8, 16))) > 0.5).astype(np.float64)
        for _ in range(n_layers - 1)
    ]
    disps = rng.uniform(-2.0, 2.0, size=n_layers)
    c = ANG // 2
    views = np.zeros((ANG, ANG, size, size))
    for u in range(ANG):
        for v in range(ANG):
            acc = np.zeros((size, size))
            for k in range(n_layers):
                t = _shift(texs[k], disps[k] * (u - c), disps[k] * (v - c))
                m = np.clip(
                    _shift(masks[k], disps[k] * (u - c), disps[k] * (v - c)),
                    0.0, 1.0,
                )
                acc = acc * (1 - 0.8 * m) + t * 0.8 * m
            views[u, v] = acc
    return np.clip(views, 0.0, 1.0)


def _views_to_sai(views):
    A, _, h, w = views.shape
    return np.moveaxis(views, 2, 1).reshape(A * h, A * w)


def _lr_views(views):
    return np.stack(
        [[imresize(views[u, v], 1.0 / SCALE) for v in range(ANG)]
         for u in range(ANG)]
    )


@pytest.mark.slow
def test_flagship_trains_past_bicubic():
    rng = np.random.default_rng(7)
    train_scenes = [_scene(rng) for _ in range(12)]
    val_scenes = [_scene(rng) for _ in range(2)]

    lr = np.stack(
        [_views_to_sai(_lr_views(v)) for v in train_scenes]
    ).astype(np.float32)
    hr = np.stack([_views_to_sai(v) for v in train_scenes]).astype(np.float32)
    data = TrainArrays(lr=lr, hr=hr)

    cfg = Config(
        model_name="LFMambaX",
        scale_factor=SCALE,
        compute_dtype="float32",
        batch_size=4,
        epochs=16,
        lr=2e-3,
        use_masked_pretrain=False,
        model_kwargs={"channels": 16, "d_state": 4},
        patch_size_for_test=8,
        stride_for_test=4,
        minibatch_for_test=4,
        whole_scene_for_test=False,  # this pin regresses the TILED path
        mesh_shape=(1,),
    )
    steps = max(1, len(data) // cfg.batch_size)
    tr = Trainer(cfg, steps_per_epoch=steps)
    state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])
    key = jax.random.key(1)
    first = last = None
    for epoch in range(cfg.epochs):
        state, m = tr.run_epoch(state, data, epoch, key)
        first = first if first is not None else m["loss"]
        last = m["loss"]
    assert np.isfinite(last)
    # measured on this seed: 0.6403 -> 0.5551 (ratio 0.867)
    assert last < 0.92 * first, (first, last)

    model = registry.get_model(cfg)
    deltas = []
    for i, views in enumerate(val_scenes):
        lrv = _lr_views(views)
        hr_sai = _views_to_sai(views).astype(np.float32)
        up = np.stack(
            [[imresize(lrv[u, v], float(SCALE)) for v in range(ANG)]
             for u in range(ANG)]
        )
        bp, _ = lf_metrics(
            jax.numpy.asarray(hr_sai),
            jax.numpy.asarray(_views_to_sai(up), jax.numpy.float32),
            ANG,
        )
        sc = TestScene(
            name=f"val{i}", dataset="synth",
            lr_y=_views_to_sai(lrv).astype(np.float32),
            hr_y=hr_sai,
            sr_cbcr=np.zeros((*hr_sai.shape, 2), np.float32),
        )
        p, _, _ = evaluate_scene(model.apply, state.variables, sc, cfg)
        deltas.append(float(p) - float(bp))
    # pinned threshold: measured +0.291/+0.100 dB on this seed; assert a
    # conservative floor so real regressions (not CPU-math noise) trip it
    assert min(deltas) > 0.03, deltas
