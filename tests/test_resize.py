"""Golden tests for resize numerics.

- MATLAB-semantics imresize is compared bit-tight against the reference's
  utils/imresize.py (imported read-only from /root/reference — it is a
  self-contained numpy module with no option.py dependency).
- torch-semantics interpolate is compared against torch.nn.functional
  directly (torch CPU is available).
"""

import importlib.util
import sys

import numpy as np
import pytest

from lfsr_tpu.ops.resize import imresize, imresize_jax, interpolate


def _load_reference_imresize():
    spec = importlib.util.spec_from_file_location(
        "ref_imresize", "/root/reference/utils/imresize.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_imresize()
RNG = np.random.default_rng(0)


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 4.0])
@pytest.mark.parametrize("shape", [(32, 32), (48, 36), (33, 41)])
def test_imresize_matches_matlab_reference(scale, shape):
    img = RNG.random(shape, dtype=np.float64)
    ours = imresize(img, scale=scale)
    theirs = REF.imresize(img, scalar_scale=scale)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


def test_imresize_output_shape_arg():
    img = RNG.random((40, 60))
    ours = imresize(img, out_shape=(10, 15))
    theirs = REF.imresize(img, output_shape=(10, 15))
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_imresize_3channel():
    img = RNG.random((32, 32, 3))
    ours = imresize(img, scale=0.5)
    theirs = REF.imresize(img, scalar_scale=0.5)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_imresize_uint8_roundtrip():
    img = (RNG.random((24, 24)) * 255).astype(np.uint8)
    ours = imresize(img, scale=2.0)
    theirs = REF.imresize(img, scalar_scale=2.0)
    np.testing.assert_array_equal(ours, theirs)


def test_imresize_jax_matches_numpy_path():
    import jax.numpy as jnp

    img = RNG.random((40, 40)).astype(np.float32)
    ours = np.asarray(imresize_jax(jnp.asarray(img), scale=0.25))
    theirs = REF.imresize(img.astype(np.float64), scalar_scale=0.25)
    np.testing.assert_allclose(ours, theirs, atol=5e-6)


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize("scale", [2, 4])
def test_interpolate_matches_torch(method, scale):
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    x = RNG.random((2, 1, 20, 24)).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), scale, method=method))
    theirs = (
        F.interpolate(
            torch.from_numpy(x), scale_factor=scale, mode=method, align_corners=False
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=2e-6)


def test_up_phase_conv_matches_interpolate_exactly():
    """The integer-scale phase-conv form is the SAME linear map as the
    dense torch-plan interpolate (periodic weights + clamp==edge-pad):
    parity to f32 accumulation order on assorted geometries, channels,
    and scales, including tiny inputs where every tap clamps."""
    import jax.numpy as jnp

    from lfsr_tpu.ops.resize import interpolate, up_phase_conv

    rng = np.random.default_rng(11)
    for (h, w, c), s in [
        ((40, 40, 1), 4), ((7, 13, 1), 4), ((16, 10, 3), 2),
        ((5, 5, 2), 3), ((1, 3, 1), 4), ((160, 160, 1), 4),
    ]:
        x = jnp.asarray(rng.random((2, h, w, c)), jnp.float32)
        fast = np.asarray(up_phase_conv(x, s))
        ref = np.asarray(
            interpolate(x.transpose(0, 3, 1, 2), s, method="bicubic")
        ).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(fast, ref, rtol=0, atol=2e-6)
