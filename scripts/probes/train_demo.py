"""Training-efficacy demonstration on synthetic light fields (real TPU).

Generates structurally realistic LF scenes (layered smooth textures with
per-view sub-pixel disparity shifts — the angular correlation real LF SR
models exploit), trains the flagship LFMambaX through the production
train.main path, and reports trained PSNR vs the bicubic baseline on
held-out scenes. Evidence that the training loop optimizes (VERDICT.md
missing-item 5); dataset-scale PSNR parity still needs the real .mat data.
"""
import sys
import time
from pathlib import Path

import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.data.generate import _write_h5
from lfsr_tpu.ops.resize import imresize

ANG, SCALE = 5, 4
HRS = 256          # HR view size for train scenes
N_TRAIN, N_VAL = 48, 3
RNG = np.random.default_rng(42)
ROOT = Path("/tmp/lfsr_train_demo")


def _texture(size, scale_px):
    """Smooth random texture: bicubic-upsampled coarse noise."""
    coarse = RNG.standard_normal((max(2, size // scale_px),) * 2)
    t = imresize(coarse, out_shape=(size, size))
    t = (t - t.min()) / (t.max() - t.min() + 1e-9)
    return t


def _shift(img, dy, dx):
    """Exact sub-pixel shift via FFT phase ramp (periodic boundary)."""
    H, W = img.shape
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    F = np.fft.fft2(img) * np.exp(-2j * np.pi * (fy * dy + fx * dx))
    return np.real(np.fft.ifft2(F))


def make_scene(size):
    """[ANG, ANG, size, size] views: layered high-frequency textures with
    per-layer disparities and smoothed occlusion-style masks — enough HF
    content that bicubic leaves several dB on the table."""
    n_layers = 4
    texs = [_texture(size, int(RNG.integers(2, 8))) for _ in range(n_layers)]
    masks = [np.ones((size, size))] + [
        (_texture(size, int(RNG.integers(16, 48))) > 0.5).astype(np.float64)
        for _ in range(n_layers - 1)
    ]
    disps = RNG.uniform(-2.5, 2.5, size=n_layers)
    views = np.zeros((ANG, ANG, size, size))
    c = ANG // 2
    for u in range(ANG):
        for v in range(ANG):
            acc = np.zeros((size, size))
            for k in range(n_layers):
                t = _shift(texs[k], disps[k] * (u - c), disps[k] * (v - c))
                m = _shift(masks[k], disps[k] * (u - c), disps[k] * (v - c))
                m = np.clip(m, 0.0, 1.0)
                acc = acc * (1 - 0.8 * m) + t * 0.8 * m
            views[u, v] = acc
    views = np.clip(views, 0.0, 1.0)
    return views.astype(np.float64)


def views_to_sai(views):
    A, _, h, w = views.shape
    return np.moveaxis(views, 2, 1).reshape(A * h, A * w)


def lr_views(views):
    A = views.shape[0]
    return np.stack(
        [[imresize(views[u, v], 1.0 / SCALE) for v in range(A)] for u in range(A)]
    )


def write_data(n_train=N_TRAIN):
    tdir = ROOT / "data_for_train" / f"SR_{ANG}x{ANG}_{SCALE}x" / "SynthLF"
    import shutil

    if tdir.exists():
        shutil.rmtree(tdir)
    n_patch = 0
    t0 = time.time()
    for si in range(n_train):
        views = make_scene(HRS)
        lr = lr_views(views)
        # patchify: HR 128 stride 128 -> 4 patches per scene (LR 32)
        P, p = 128, 32
        for py in range(HRS // P):
            for px in range(HRS // P):
                hrp = views[:, :, py * P : (py + 1) * P, px * P : (px + 1) * P]
                lrp = lr[:, :, py * p : (py + 1) * p, px * p : (px + 1) * p]
                n_patch += 1
                _write_h5(
                    tdir / f"{n_patch:06d}.h5",
                    Lr_SAI_y=views_to_sai(lrp).astype(np.float32),
                    Hr_SAI_y=views_to_sai(hrp).astype(np.float32),
                )
    print(f"train patches: {n_patch} ({time.time()-t0:.0f}s)", flush=True)

    import h5py

    vdir = ROOT / "data_for_test" / f"SR_{ANG}x{ANG}_{SCALE}x" / "SynthVal"
    vdir.mkdir(parents=True, exist_ok=True)
    vals = []
    for si in range(N_VAL):
        views = make_scene(HRS)
        lr = lr_views(views)
        lr_sai = views_to_sai(lr).astype(np.float32)
        hr_sai = views_to_sai(views).astype(np.float32)
        with h5py.File(vdir / f"val_{si:02d}.h5", "w") as hf:
            hf.create_dataset("Lr_SAI_y", data=lr_sai.T, dtype="single")
            hf.create_dataset("Hr_SAI_y", data=hr_sai.T, dtype="single")
        vals.append((lr, views))
    return vals


def bicubic_psnr(vals):
    from lfsr_tpu.ops.metrics import lf_metrics
    import jax.numpy as jnp

    ps, ss = [], []
    for lr, views in vals:
        up = np.stack(
            [[imresize(lr[u, v], float(SCALE)) for v in range(ANG)] for u in range(ANG)]
        )
        p, s = lf_metrics(
            jnp.asarray(views_to_sai(views), jnp.float32),
            jnp.asarray(views_to_sai(up), jnp.float32),
            ANG,
        )
        ps.append(float(p)); ss.append(float(s))
    return float(np.mean(ps)), float(np.mean(ss))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    model_name = sys.argv[2] if len(sys.argv) > 2 else "LFMambaX"
    # scale knob (VERDICT r3 #2b): n_train=300 -> 1200 patches, enough
    # that the run no longer overfits by epoch ~20 like the 192-patch set
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else N_TRAIN
    vals = write_data(n_train)
    bp, bs = bicubic_psnr(vals)
    print(f"bicubic baseline: PSNR {bp:.3f}  SSIM {bs:.4f}", flush=True)

    import train as train_cli

    cfg = Config(
        model_name=model_name,
        scale_factor=SCALE,
        path_for_train=str(ROOT / "data_for_train"),
        path_for_test=str(ROOT / "data_for_test"),
        path_log=str(ROOT / "log"),
        batch_size=4 if n_train <= 64 else 8,
        epochs=epochs,
        eval_every=max(10, epochs // 3),
        use_masked_pretrain=False,
        mesh_shape=(1,),
    )
    t0 = time.time()
    state = train_cli.main(cfg)
    print(f"training wall: {time.time()-t0:.0f}s", flush=True)

    # final held-out eval through the production tiled path
    from lfsr_tpu.data.datasets import load_test_scenes
    from lfsr_tpu.models import registry
    from lfsr_tpu.train.evaluate import evaluate_scene

    model = registry.get_model(cfg)
    sets = load_test_scenes(cfg.path_for_test, ANG, SCALE, "ALL", tag=cfg.task_tag())
    ps, ss = [], []
    for sc in sets["SynthVal"]:
        p, s, _ = evaluate_scene(model.apply, state.variables, sc, cfg)
        ps.append(p); ss.append(s)
        print(f"  {sc.name}: PSNR {p:.3f} SSIM {s:.4f}", flush=True)
    print(
        f"RESULT: trained PSNR {np.mean(ps):.3f} SSIM {np.mean(ss):.4f} "
        f"vs bicubic PSNR {bp:.3f} SSIM {bs:.4f}  "
        f"(delta {np.mean(ps)-bp:+.3f} dB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
