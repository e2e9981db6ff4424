"""End-to-end pipeline test on synthetic data (CPU):

h5 patch files -> train.main (2 epochs, checkpoints) -> inference.main
(tiled SR, RGB recompose, BMP tree, zip) -> validate_submission VALID.

Mirrors run_end_to_end_pipeline.sh's generate->train->infer->package->
validate chain on a conv-only tiny model so the whole loop runs in ~1 min.
"""

import numpy as np
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.data.generate import _write_h5
from lfsr_tpu.tools import submission

pytestmark = pytest.mark.slow

ANG, SCALE = 5, 4
RNG = np.random.default_rng(3)


def _write_train_patches(root, n=16):
    d = root / "data_for_train" / f"SR_{ANG}x{ANG}_{SCALE}x" / "SynthSet"
    for i in range(n):
        hr = RNG.random((ANG * 128, ANG * 128)).astype(np.float32)
        lr = hr.reshape(ANG * 32, 4, ANG * 32, 4).mean((1, 3))
        _write_h5(d / f"{i + 1:06d}.h5", Lr_SAI_y=lr, Hr_SAI_y=hr)


def _write_test_scene(root, subset, w_hr, h_hr):
    lr_h, lr_w = h_hr // SCALE, w_hr // SCALE
    lr = RNG.random((ANG * lr_h, ANG * lr_w)).astype(np.float32)
    hr = RNG.random((ANG * h_hr, ANG * w_hr)).astype(np.float32)
    cbcr = RNG.random((ANG * h_hr, ANG * w_hr, 2)).astype(np.float32) * 0.5 + 0.25
    d = root / "data_for_test" / f"SR_{ANG}x{ANG}_{SCALE}x" / subset
    d.mkdir(parents=True, exist_ok=True)
    import h5py

    with h5py.File(d / "scene_00.h5", "w") as hf:
        hf.create_dataset("Lr_SAI_y", data=lr.T, dtype="single")
        hf.create_dataset("Hr_SAI_y", data=hr.T, dtype="single")
        hf.create_dataset(
            "Sr_SAI_cbcr", data=np.transpose(cbcr, (2, 1, 0)), dtype="single"
        )


def test_train_infer_validate_pipeline(tmp_path, monkeypatch):
    import train as train_cli
    import inference as infer_cli

    _write_train_patches(tmp_path)
    _write_test_scene(tmp_path, "Real", 624, 432)
    _write_test_scene(tmp_path, "Synth", 500, 500)

    cfg = Config(
        model_name="DistgSSR",
        scale_factor=SCALE,
        compute_dtype="float32",
        model_kwargs={"channels": 16, "n_groups": 1, "n_blocks": 1},
        path_for_train=str(tmp_path / "data_for_train"),
        path_for_test=str(tmp_path / "data_for_test"),
        path_log=str(tmp_path / "log"),
        batch_size=8,
        epochs=2,
        eval_every=100,  # skip mid-train validation
        use_masked_pretrain=False,
        minibatch_for_test=16,
        mesh_shape=(1,),
    )
    state = train_cli.main(cfg)
    assert state is not None

    from lfsr_tpu.train.trainer import latest_checkpoint
    from lfsr_tpu.utils import create_dirs

    _, ckpt_dir, _ = create_dirs(cfg)
    assert latest_checkpoint(ckpt_dir) is not None, "no checkpoint written"

    monkeypatch.setattr(submission, "EXPECTED_SCENES", {"Real": 1, "Synth": 1})
    zip_path = infer_cli.main(
        cfg, out_root=str(tmp_path / "submission"), make_zip=True, skip_gate=True
    )
    rep = submission.validate_submission(zip_path)
    assert rep.ok, rep.errors


def test_whole_scene_inference_pipeline(tmp_path, monkeypatch):
    """inference.main's scene-batched whole-scene path (geometry groups,
    whole_scene_minibatch scenes per dispatch) through BMP tree -> zip ->
    byte-level validation, incl. two different scene geometries."""
    import inference as infer_cli

    _write_test_scene(tmp_path, "Real", 624, 432)
    _write_test_scene(tmp_path, "Synth", 500, 500)

    cfg = Config(
        model_name="DistgSSR",
        scale_factor=SCALE,
        compute_dtype="float32",
        model_kwargs={"channels": 16, "n_groups": 1, "n_blocks": 1},
        path_for_train=str(tmp_path / "data_for_train"),
        path_for_test=str(tmp_path / "data_for_test"),
        path_log=str(tmp_path / "log"),
        whole_scene_for_test=True,
        whole_scene_minibatch=2,
        mesh_shape=(1,),
    )
    monkeypatch.setattr(submission, "EXPECTED_SCENES", {"Real": 1, "Synth": 1})
    zip_path = infer_cli.main(
        cfg, out_root=str(tmp_path / "submission_whole"), make_zip=True,
        skip_gate=True,
    )
    rep = submission.validate_submission(zip_path)
    assert rep.ok, rep.errors
