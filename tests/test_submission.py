"""Submission packaging + validation tests (small synthetic trees)."""

import numpy as np
import pytest

from lfsr_tpu.tools import bmp, submission


RNG = np.random.default_rng(8)


def _scene_views(w, h):
    return (RNG.random((5, 5, h, w, 3)) * 200 + 20).astype(np.uint8)


def _build(root, n_real=2, n_synth=2, real_dims=(624, 432), synth_dims=(500, 500)):
    for subset, n, (w, h) in [("Real", n_real, real_dims), ("Synth", n_synth, synth_dims)]:
        for k in range(n):
            submission.save_scene_views(
                root / subset / f"scene_{k:02d}", _scene_views(w, h)
            )


@pytest.fixture()
def small_expectations(monkeypatch):
    monkeypatch.setattr(submission, "EXPECTED_SCENES", {"Real": 2, "Synth": 2})


@pytest.mark.slow
def test_valid_submission_directory(tmp_path, small_expectations):
    _build(tmp_path)
    rep = submission.validate_submission(tmp_path)
    assert rep.ok, rep.errors
    assert rep.checks > 100  # header-checked every view


@pytest.mark.slow
def test_valid_submission_zip(tmp_path, small_expectations):
    _build(tmp_path)
    z = submission.pack_submission(tmp_path, tmp_path / "sub.zip")
    rep = submission.validate_submission(z)
    assert rep.ok, rep.errors


@pytest.mark.slow
def test_missing_scene_flagged(tmp_path, small_expectations):
    _build(tmp_path, n_real=1)
    rep = submission.validate_submission(tmp_path)
    assert any("1 scenes, expected 2" in e for e in rep.errors)


@pytest.mark.slow
def test_missing_view_flagged(tmp_path, small_expectations):
    _build(tmp_path)
    (tmp_path / "Real" / "scene_00" / "View_2_3.bmp").unlink()
    rep = submission.validate_submission(tmp_path)
    assert any("missing views" in e for e in rep.errors)


@pytest.mark.slow
def test_wrong_dims_flagged(tmp_path, small_expectations):
    _build(tmp_path, real_dims=(100, 100))
    rep = submission.validate_submission(tmp_path)
    assert any("dims" in e for e in rep.errors)


def test_bmp_header_contract():
    img = (RNG.random((432, 624, 3)) * 255).astype(np.uint8)
    data = bmp.encode_bmp(img)
    info = bmp.parse_header(data)
    # the byte-level contract validate_submission.py:314-323 checks
    assert info["magic"] == b"BM"
    assert info["bits_per_pixel"] == 24
    assert info["compression"] == 0
    assert (info["width"], info["height"]) == (624, 432)
    assert info["data_offset"] == 54


def test_verify_channels_artifact(tmp_path):
    _build(tmp_path / "sub", real_dims=(20, 12), synth_dims=(16, 16))
    orig, swap = submission.verify_channels(tmp_path / "sub", tmp_path / "out")
    a, b = bmp.read_bmp(orig), bmp.read_bmp(swap)
    assert a.shape == b.shape and a.shape[2] == 3
    np.testing.assert_array_equal(a, b[:, :, ::-1])
