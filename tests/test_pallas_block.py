"""Tests for the fused LayerNorm + MultiScaleLocal block-front kernel
(lfsr_tpu.ops.pallas_block): reference-vs-flax-module equivalence,
kernel-vs-reference parity in interpret mode, and gradient wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from lfsr_tpu.ops import pallas_block as plb
from lfsr_tpu.models.lfmambax import MultiScaleLocal


class _Front(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        return xn, MultiScaleLocal(self.feats, self.dtype)(xn)


def _weights(params, feats, dt):
    c4 = feats // 4
    mp = params["MultiScaleLocal_0"]
    wh = mp["Conv_0"]["kernel"].reshape(c4, c4).astype(dt)
    wm = mp["Conv_2"]["kernel"].reshape(feats, feats).astype(dt)
    wk = mp["Conv_1"]["kernel"][:, :, 0, :].astype(dt)
    gamma = params["LayerNorm_0"]["scale"]
    beta = params["LayerNorm_0"]["bias"]
    return gamma, beta, wh @ wm[:c4], wm[c4:], wk


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ref_matches_flax_modules(dtype):
    feats = 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, feats), jnp.float32).astype(dtype)
    m = _Front(feats, dtype)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    xn_m, loc_m = m.apply({"params": params}, x)
    xn_r, loc_r = plb.ln_msl_ref(x, *_weights(params, feats, dtype))
    tol = 1e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(xn_m, np.float32), np.asarray(xn_r, np.float32), atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(loc_m, np.float32), np.asarray(loc_r, np.float32), atol=tol
    )


@pytest.mark.parametrize("shape,feats", [((2, 16, 16, 32), 32), ((1, 24, 24, 64), 64)])
def test_kernel_matches_ref_interpret(shape, feats):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, shape, jnp.float32)
    m = _Front(feats)
    params = m.init(jax.random.PRNGKey(3), x)["params"]
    w = _weights(params, feats, jnp.float32)
    plb.FORCE_KERNEL_INTERPRET = True
    try:
        xn_k, loc_k = jax.jit(plb.ln_msl)(x, *w)
    finally:
        plb.FORCE_KERNEL_INTERPRET = False
    xn_r, loc_r = plb.ln_msl_ref(x, *w)
    np.testing.assert_allclose(np.asarray(xn_k), np.asarray(xn_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(loc_k), np.asarray(loc_r), atol=1e-5)


@pytest.mark.slow
def test_block_wiring_matches_fallback_and_param_tree_stable():
    """LFVSSMBlock's fused front (interpret mode) must equal its XLA
    fallback AND leave the param-tree paths/shapes identical, so
    checkpoints restore across the gate."""
    from lfsr_tpu.models.lfmambax import LFVSSMBlock

    feats = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, feats), jnp.float32)
    m = LFVSSMBlock(feats, 16, 4, 2.0, 0.1, jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)
    y_ref = m.apply(params, x)
    plb.FORCE_KERNEL_INTERPRET = True
    try:
        params2 = m.init(jax.random.PRNGKey(1), x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
            assert a.shape == b.shape
        y_fused = m.apply(params, x)
    finally:
        plb.FORCE_KERNEL_INTERPRET = False
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5)


@pytest.mark.slow
def test_gradients_flow_through_reference():
    feats = 32
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, feats), jnp.float32)
    m = _Front(feats)
    params = m.init(jax.random.PRNGKey(5), x)["params"]
    w = _weights(params, feats, jnp.float32)

    def f(x, *w):
        xn, loc = plb.ln_msl(x, *w)
        return jnp.sum(xn * 0.3 + loc)

    def f_ref(x, *w):
        xn, loc = plb.ln_msl_ref(x, *w)
        return jnp.sum(xn * 0.3 + loc)

    g = jax.grad(f, argnums=(0, 1, 3, 5))(x, *w)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 3, 5))(x, *w)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
