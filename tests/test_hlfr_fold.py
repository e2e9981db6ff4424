"""HLFR out-conv fold correctness: folded-LR formulation == direct HR conv."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.models.common import pixel_shuffle
from lfsr_tpu.models.lfmambax import HLFR, _fold_out_conv


def test_fold_out_conv_matches_direct():
    key = jax.random.PRNGKey(0)
    for r in (2, 4):
        c = 16
        k3 = jax.random.normal(key, (3, 3, c, 1), jnp.float32)
        z = jax.random.normal(jax.random.PRNGKey(r), (2, 12, 12, c * r * r), jnp.float32)
        hr = pixel_shuffle(z, r)
        direct = jax.lax.conv_general_dilated(
            hr, k3, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kf = _fold_out_conv(k3, r)
        folded = pixel_shuffle(
            jax.lax.conv_general_dilated(
                z, kf, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")), r)
        err = float(jnp.max(jnp.abs(direct - folded)))
        assert err < 1e-5, (r, err)


@pytest.mark.slow
def test_hlfr_forward_runs_and_grad():
    mod = HLFR(16, 4, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 16), jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x)
    y = jax.jit(mod.apply)(params, x)
    assert y.shape == (1, 64, 64, 1)
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # the out conv's gradient must flow through the fold
    assert float(jnp.max(jnp.abs(g["params"]["Conv_12"]["kernel"]))) > 0
