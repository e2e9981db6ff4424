"""Golden test: our data generator vs the reference generator, byte-tight.

Synthesizes a tiny 9x9-view .mat scene, runs the reference
Generate_Data_for_Training.py in a subprocess (with a stubbed ``option``
module so utils.utils imports cleanly), runs our
generate_training_patches on the same scene, and asserts every h5 array
matches exactly (same keys, same transposed layout, same float32 values).
"""

import os
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
import scipy.io as scio

from lfsr_tpu.data.generate import generate_training_patches

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _make_scene(path: Path, seed: int = 0, views: int = 9, hw: int = 160):
    """A smooth synthetic LF (values may exceed [0,1] slightly to check
    the no-clip parity path)."""
    rng = np.random.default_rng(seed)
    base = rng.random((hw + views, hw + views, 3))
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, (6, 6, 0))
    base = (base - base.min()) / (base.max() - base.min()) * 1.05 - 0.02
    lf = np.stack(
        [
            np.stack([base[u : u + hw, v : v + hw] for v in range(views)])
            for u in range(views)
        ]
    )  # [U, V, H, W, 3]
    scio.savemat(path, {"LF": lf})


def _run_reference(src_root: Path, dst_root: Path, scale: int):
    code = f"""
import sys, types
opt = types.ModuleType("option"); opt.args = types.SimpleNamespace()
sys.modules["option"] = opt
# utils.utils imports skimage.metrics at module level; the generator only
# needs rgb2ycbcr, so a stub suffices in this skimage-free environment.
sk = types.ModuleType("skimage"); skm = types.ModuleType("skimage.metrics")
sk.metrics = skm
sys.modules["skimage"] = sk; sys.modules["skimage.metrics"] = skm
sys.modules["xlwt"] = types.ModuleType("xlwt")
sys.argv = ["Generate_Data_for_Training.py", "--angRes", "5",
            "--scale_factor", "{scale}", "--data_for", "training",
            "--src_data_path", {str(src_root) + os.sep!r},
            "--save_data_path", {str(dst_root) + os.sep!r}]
exec(open({REF + "/Generate_Data_for_Training.py"!r}).read())
"""
    env = dict(os.environ, PYTHONPATH=REF, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REF,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]


def _h5_arrays(root: Path):
    out = {}
    for p in sorted(root.rglob("*.h5")):
        with h5py.File(p, "r") as f:
            out[p.name] = {k: np.asarray(f[k]) for k in f.keys()}
    return out


def test_training_patches_byte_parity(tmp_path):
    src = tmp_path / "datasets"
    (src / "HCI_new" / "training").mkdir(parents=True)
    _make_scene(src / "HCI_new" / "training" / "scene0.mat")

    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    _run_reference(src, ref_out, scale=4)
    ref = _h5_arrays(ref_out / "data_for_training")
    assert ref, "reference produced no patches"

    ours_root = tmp_path / "ours"
    n = generate_training_patches(str(src), str(ours_root), ang=5, scale=4)
    ours = _h5_arrays(ours_root)
    assert n == len(ref) and set(ours) == set(ref)

    for name in sorted(ref):
        for key in ("Lr_SAI_y", "Hr_SAI_y"):
            a, b = ref[name][key], ours[name][key]
            assert a.shape == b.shape, (name, key, a.shape, b.shape)
            assert a.dtype == b.dtype == np.float32
            np.testing.assert_array_equal(a, b, err_msg=f"{name}/{key}")
