"""RepConv structural re-parameterization: train/deploy output parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.models.repconv import RepConv, reparameterize

RNG = np.random.default_rng(7)


def _trained_variables(m, x, steps=3):
    v = dict(m.init(jax.random.key(0), x))
    for i in range(steps):
        _, upd = m.apply(v, x + 0.1 * i, True, mutable=["batch_stats"])
        v = {"params": v["params"], **upd}
    return v


def test_repconv_fusion_parity_dilated():
    x = jnp.asarray(RNG.normal(size=(2, 20, 20, 8)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        m = RepConv(8, 3, 5, False)
        v = _trained_variables(m, x)
        ye = m.apply(v, x)
        dp, ds = reparameterize(v["params"], v["batch_stats"])
        assert not ds  # RepConv-only tree: all stats folded into the kernel
        yd = RepConv(8, 3, 5, True).apply({"params": dp}, x)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yd), atol=1e-5)


def test_repconv_fusion_parity_channel_change():
    # cin != cout: no identity branch
    x = jnp.asarray(RNG.normal(size=(1, 12, 12, 4)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        m = RepConv(8, 3, 1, False)
        v = _trained_variables(m, x)
        ye = m.apply(v, x)
        dp, _ = reparameterize(v["params"], v["batch_stats"])
        yd = RepConv(8, 3, 1, True).apply({"params": dp}, x)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yd), atol=1e-5)


@pytest.mark.slow
def test_efficient_lfnet_v2_full_deploy_parity():
    cfg = Config(model_name="EfficientLFNetV2", scale_factor=2, compute_dtype="float32")
    model = registry.get_model(cfg)
    x = jnp.asarray(RNG.normal(size=(1, 5 * 8, 5 * 8, 1)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        v = _trained_variables(model, x)
        ye = model.apply(v, x)
        dp, ds = reparameterize(v["params"], v["batch_stats"])
        model_d = registry.get_model(cfg.replace(model_kwargs={"deploy": True}))
        yd = model_d.apply({"params": dp, "batch_stats": ds}, x)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yd), atol=2e-5)


def test_v2_param_count_matches_reference_claim():
    import math

    cfg = Config(model_name="EfficientLFNetV2", scale_factor=4, compute_dtype="float32")
    model = registry.get_model(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 40, 40, 1), jnp.float32)
    )
    n = sum(math.prod(p.shape) for p in jax.tree.leaves(shapes["params"]))
    assert n == 547_540  # NTIRE2026_SOLUTION.md:8-10 exact claim
