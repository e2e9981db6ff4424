"""Runtime datasets: in-memory patch store + device-side augmentation.

The reference streams one h5 file per item through torch DataLoader worker
processes (utils/utils_datasets.py:15-58, train.py:36-38). The whole
training set is ~30K small float32 patches — it fits in host RAM — so here
we load everything once into contiguous numpy arrays and feed the device
with simple synchronous batches; augmentation (random W/H flips and the
LF-specific U<->V + H<->W transpose, utils_datasets.py:142-165) runs inside
the jitted train step from a PRNG key.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TrainArrays:
    lr: np.ndarray  # [N, A*h, A*w] float32
    hr: np.ndarray  # [N, A*H, A*W] float32

    def __len__(self):
        return self.lr.shape[0]


@dataclass
class TestScene:
    name: str
    dataset: str
    lr_y: np.ndarray  # [A*h, A*w]
    hr_y: np.ndarray  # [A*H, A*W]
    sr_cbcr: np.ndarray  # [A*H, A*W, 2]


def _dataset_dir(root: str, ang: int, scale: int, tag: str | None = None) -> Path:
    """Task directory: 'SR_AxA_sx' by default, or an explicit tag such as
    'RE_2x2_5x5' (utils_datasets.py:20-27)."""
    return Path(root) / (tag or f"SR_{ang}x{ang}_{scale}x")


def list_train_files(root: str, ang: int, scale: int, data_name: str = "ALL", tag: str | None = None):
    base = _dataset_dir(root, ang, scale, tag)
    names = sorted(os.listdir(base)) if data_name == "ALL" else [data_name]
    files = []
    for ds in names:
        d = base / ds
        if d.is_dir():
            files += [d / f for f in sorted(os.listdir(d)) if f.endswith(".h5")]
    return files


def load_train_set(root: str, ang: int, scale: int, data_name: str = "ALL", tag: str | None = None) -> TrainArrays:
    """Read every training h5 once into stacked arrays.

    h5 arrays are stored transposed (MATLAB column-major); the reference's
    ToTensor on the transposed-read array means training items keep the
    on-disk orientation (utils_datasets.py:44-48 reads without transpose —
    augmentation's transpose makes orientation irrelevant for training).
    We transpose to row-major for consistency with the test loader.
    """
    files = list_train_files(root, ang, scale, data_name, tag)
    lrs, hrs = [], []
    for f in files:
        with h5py.File(f, "r") as hf:
            lrs.append(np.asarray(hf["Lr_SAI_y"], dtype=np.float32).T)
            hrs.append(np.asarray(hf["Hr_SAI_y"], dtype=np.float32).T)
    if not lrs:
        raise FileNotFoundError(f"no training .h5 under {_dataset_dir(root, ang, scale)}")
    return TrainArrays(lr=np.stack(lrs), hr=np.stack(hrs))


def load_test_scenes(root: str, ang: int, scale: int, data_name: str = "ALL", tag: str | None = None):
    """Per-dataset lists of whole test scenes (utils_datasets.py:61-139)."""
    base = _dataset_dir(root, ang, scale, tag)
    names = sorted(os.listdir(base)) if data_name == "ALL" else [data_name]
    out: dict[str, list[TestScene]] = {}
    for ds in names:
        d = base / ds
        if not d.is_dir():
            continue
        scenes = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".h5"):
                continue
            with h5py.File(d / f, "r") as hf:
                lr = np.asarray(hf["Lr_SAI_y"], dtype=np.float32).T
                hr = np.asarray(hf["Hr_SAI_y"], dtype=np.float32).T
                if "Sr_SAI_cbcr" in hf:
                    cbcr = np.asarray(hf["Sr_SAI_cbcr"], dtype=np.float32)
                    cbcr = np.transpose(cbcr, (2, 1, 0))
                else:  # dummy chroma fallback (utils_datasets.py:121-126)
                    cbcr = np.zeros((*hr.shape, 2), dtype=np.float32)
            scenes.append(
                TestScene(name=f[:-3], dataset=ds, lr_y=lr, hr_y=hr, sr_cbcr=cbcr)
            )
        if scenes:
            out[ds] = scenes
    return out


def augment_batch(key: jax.Array, lr: jnp.ndarray, hr: jnp.ndarray):
    """LF-aware random augmentation, per batch item, inside jit.

    Semantics of utils_datasets.py:155-165: independent 50% W-flip, H-flip
    and U<->V/H<->W transpose applied identically to LR and HR mosaics.
    Implemented with jnp.where selects so shapes stay static.
    """
    b = lr.shape[0]
    kw, kh, kt = jax.random.split(key, 3)
    fw = jax.random.bernoulli(kw, 0.5, (b,))
    fh = jax.random.bernoulli(kh, 0.5, (b,))
    ft = jax.random.bernoulli(kt, 0.5, (b,))

    def _apply(x):
        x = jnp.where(fw[:, None, None], x[:, :, ::-1], x)
        x = jnp.where(fh[:, None, None], x[:, ::-1, :], x)
        x = jnp.where(ft[:, None, None], jnp.swapaxes(x, -1, -2), x)
        return x

    return _apply(lr), _apply(hr)


def batch_indices(key: jax.Array, n: int, batch: int, steps: int) -> np.ndarray:
    """Epoch's worth of shuffled batch indices, [steps, batch]."""
    perm = np.asarray(jax.random.permutation(key, n))
    need = steps * batch
    reps = -(-need // n)
    idx = np.tile(perm, reps)[:need]
    return idx.reshape(steps, batch)
