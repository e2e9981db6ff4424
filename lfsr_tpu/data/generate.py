"""Offline data generation: .mat light-field scenes -> per-patch/per-scene HDF5.

Byte-compatible with the reference generators:
- Generate_Data_for_Training.py:22-100 — central 5x5 crop of the 9x9 views,
  BT.601 Y extraction, HR patches of ``patchsize = 32*scale`` with stride
  ``patchsize/2``, MATLAB-bicubic LR downsampling, and **column-major
  (transposed) h5 layout** matching the MATLAB-era files (L86-87).
- Generate_Data_for_Test.py:22-99 — whole scenes (H,W floored to a multiple
  of ``scale*angRes`` per the reference's //4 floor at L55-56), plus
  ``Sr_SAI_cbcr``: chroma downsampled then bicubic-upsampled for final RGB
  recomposition.
- Generate_Data_for_inference.py:22-101 — input scenes are already LR;
  ``Hr_SAI_y`` is a bicubic x(scale) placeholder and ``Sr_SAI_cbcr`` the
  upsampled LR chroma.

All numerics run in float64 numpy so generated files match the reference
bit-for-bit given the same inputs.
"""

from __future__ import annotations

import os
from pathlib import Path

import h5py
import numpy as np

from lfsr_tpu.ops.color import rgb2ycbcr
from lfsr_tpu.ops.resize import imresize

TRAIN_DATASETS = ["EPFL", "HCI_new", "HCI_old", "INRIA_Lytro", "Stanford_Gantry"]


def load_lf_mat(path: str) -> np.ndarray:
    """Load an LF array from a .mat file as [U, V, H, W, 3] float in [0,1].

    Tries HDF5-style (v7.3) first, then scipy (older .mat), mirroring
    Generate_Data_for_Training.py:49-54 including the transpose from
    MATLAB's column-major storage.
    """
    try:
        with h5py.File(path, "r") as hf:
            lf = np.array(hf.get("LF"))
            lf = np.transpose(lf, (4, 3, 2, 1, 0))
    except OSError:
        import scipy.io as sio

        lf = np.array(sio.loadmat(path)["LF"])
    return lf.astype(np.float64)


def central_crop_views(lf: np.ndarray, ang: int) -> np.ndarray:
    """Crop the central ang x ang views (Generate_Data_for_Training.py:58)."""
    U, V = lf.shape[:2]
    u0 = (U - ang) // 2
    v0 = (V - ang) // 2
    return lf[u0 : u0 + ang, v0 : v0 + ang, :, :, :3]


def _views_y(lf: np.ndarray) -> np.ndarray:
    """[U,V,H,W,3] RGB -> [U,V,H,W] Y channel, float64.

    No clipping: the reference generators pass LF data through rgb2ycbcr
    unclipped (Generate_Data_for_Training.py:59-72), so out-of-range
    source values propagate identically here to preserve bit parity.
    """
    U, V, H, W, _ = lf.shape
    out = np.empty((U, V, H, W), dtype=np.float64)
    for u in range(U):
        for v in range(V):
            out[u, v] = rgb2ycbcr(lf[u, v])[..., 0]
    return out


def _views_cbcr(lf: np.ndarray) -> np.ndarray:
    """[U,V,H,W,3] RGB -> [U,V,H,W,2] CbCr (unclipped, as the reference)."""
    U, V, H, W, _ = lf.shape
    out = np.empty((U, V, H, W, 2), dtype=np.float64)
    for u in range(U):
        for v in range(V):
            out[u, v] = rgb2ycbcr(lf[u, v])[..., 1:]
    return out


def views_to_sai_np(v: np.ndarray) -> np.ndarray:
    """[U,V,h,w,(...)] -> [U*h, V*w, (...)] SAI mosaic, numpy."""
    U, V, h, w = v.shape[:4]
    rest = v.shape[4:]
    x = np.moveaxis(v, 2, 1)  # [U, h, V, w, ...]
    return x.reshape(U * h, V * w, *rest)


def _write_h5(path: Path, **arrays):
    """Write arrays transposed (MATLAB column-major convention,
    Generate_Data_for_Training.py:85-88)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as hf:
        for key, arr in arrays.items():
            hf.create_dataset(key, data=np.transpose(arr), dtype="single")


def generate_training_patches(
    src_root: str,
    out_root: str,
    ang: int = 5,
    scale: int = 4,
    datasets=None,
    patch_hr: int | None = None,
) -> int:
    """Emit per-patch {Lr_SAI_y, Hr_SAI_y} h5 files. Returns patch count."""
    datasets = datasets or TRAIN_DATASETS
    patch_hr = patch_hr or 32 * scale
    stride = patch_hr // 2
    tag = f"SR_{ang}x{ang}_{scale}x"
    total = 0
    for ds in datasets:
        src = Path(src_root) / ds / "training"
        if not src.is_dir():
            continue
        idx_save = 0  # per-dataset running index from 1, '%06d.h5'
        # (Generate_Data_for_Training.py:63-84 naming convention)
        for scene in sorted(os.listdir(src)):
            if not scene.endswith(".mat"):
                continue
            lf = central_crop_views(load_lf_mat(str(src / scene)), ang)
            y = _views_y(lf)  # [U,V,H,W]
            H, W = y.shape[2:]
            for hs in range(0, H - patch_hr + 1, stride):
                for ws in range(0, W - patch_hr + 1, stride):
                    hr = y[:, :, hs : hs + patch_hr, ws : ws + patch_hr]
                    lr = np.stack(
                        [
                            np.stack(
                                [
                                    imresize(hr[u, v], scale=1.0 / scale)
                                    for v in range(ang)
                                ]
                            )
                            for u in range(ang)
                        ]
                    )
                    idx_save += 1
                    total += 1
                    _write_h5(
                        Path(out_root) / tag / ds / f"{idx_save:06d}.h5",
                        Lr_SAI_y=views_to_sai_np(lr),
                        Hr_SAI_y=views_to_sai_np(hr),
                    )
    return total


def generate_test_scenes(
    src_root: str,
    out_root: str,
    ang: int = 5,
    scale: int = 4,
    datasets=None,
    split: str = "test",
) -> int:
    """Emit whole-scene {Lr_SAI_y, Hr_SAI_y, Sr_SAI_cbcr} h5 files."""
    datasets = datasets or TRAIN_DATASETS
    tag = f"SR_{ang}x{ang}_{scale}x"
    n = 0
    for ds in datasets:
        src = Path(src_root) / ds / split
        if not src.is_dir():
            continue
        for scene in sorted(os.listdir(src)):
            if not scene.endswith(".mat"):
                continue
            lf = central_crop_views(load_lf_mat(str(src / scene)), ang)
            H, W = lf.shape[2], lf.shape[3]
            # floor H, W to /4 so LR dims divide evenly (Generate_Data_for_Test.py:55-56)
            H = H // 4 * 4
            W = W // 4 * 4
            lf = lf[:, :, :H, :W]
            y = _views_y(lf)
            cbcr = _views_cbcr(lf)
            lr_y = np.stack(
                [
                    np.stack([imresize(y[u, v], scale=1.0 / scale) for v in range(ang)])
                    for u in range(ang)
                ]
            )
            # Chroma: downsample then bicubic-upsample (Generate_Data_for_Test.py:79-82)
            sr_cbcr = np.stack(
                [
                    np.stack(
                        [
                            np.stack(
                                [
                                    imresize(
                                        imresize(cbcr[u, v, :, :, c], scale=1.0 / scale),
                                        scale=float(scale),
                                    )
                                    for c in range(2)
                                ],
                                axis=-1,
                            )
                            for v in range(ang)
                        ]
                    )
                    for u in range(ang)
                ]
            )
            name = scene[:-4] + ".h5"
            _write_h5(
                Path(out_root) / tag / ds / name,
                Lr_SAI_y=views_to_sai_np(lr_y),
                Hr_SAI_y=views_to_sai_np(y),
                Sr_SAI_cbcr=views_to_sai_np(sr_cbcr),
            )
            n += 1
    return n


def generate_inference_scenes(
    src_root: str, out_root: str, ang: int = 5, scale: int = 4, datasets=("Real", "Synth")
) -> int:
    """NTIRE val/infer: inputs are already LR; Hr is a bicubic placeholder
    (Generate_Data_for_inference.py:77-84)."""
    tag = f"SR_{ang}x{ang}_{scale}x"
    n = 0
    for ds in datasets:
        src = Path(src_root) / ds
        if not src.is_dir():
            continue
        for scene in sorted(os.listdir(src)):
            if not scene.endswith(".mat"):
                continue
            lf = central_crop_views(load_lf_mat(str(src / scene)), ang)
            y = _views_y(lf)
            cbcr = _views_cbcr(lf)
            up = lambda im: imresize(im, scale=float(scale))
            hr_placeholder = np.stack(
                [np.stack([up(y[u, v]) for v in range(ang)]) for u in range(ang)]
            )
            sr_cbcr = np.stack(
                [
                    np.stack(
                        [
                            np.stack([up(cbcr[u, v, :, :, c]) for c in range(2)], axis=-1)
                            for v in range(ang)
                        ]
                    )
                    for u in range(ang)
                ]
            )
            _write_h5(
                Path(out_root) / tag / ds / (scene[:-4] + ".h5"),
                Lr_SAI_y=views_to_sai_np(y),
                Hr_SAI_y=views_to_sai_np(hr_placeholder),
                Sr_SAI_cbcr=views_to_sai_np(sr_cbcr),
            )
            n += 1
    return n
