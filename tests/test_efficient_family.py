"""MyEfficientLFNet-family parity tests (V5, V6.4 equivalents)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

RNG = np.random.default_rng(9)


def _params(cfg):
    model = registry.get_model(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 40, 40, 1), jnp.float32)
    )
    tree = shapes["params"] if "params" in shapes else shapes
    return sum(math.prod(p.shape) for p in jax.tree.leaves(tree))


def test_v5_conv_fallback_matches_cloud_pipeline_count():
    # cloud_train.sh:22 states 367,526 parameters — reproduced exactly by
    # the FastConvSSM variant.
    cfg = Config(
        model_name="EfficientLFNetV5", scale_factor=4,
        compute_dtype="float32", model_kwargs={"ssm_impl": "conv"},
    )
    assert _params(cfg) == 367_526


@pytest.mark.slow
@pytest.mark.parametrize("name", ["EfficientLFNetV5", "EfficientLFNetV64"])
def test_family_forward(name):
    cfg = Config(
        model_name=name, scale_factor=2, compute_dtype="float32",
        model_kwargs={"n_blocks": 2, "channels": 24, "d_state": 4, "remat": False},
    )
    model = registry.get_model(cfg)
    x = jnp.asarray(RNG.random((1, 5 * 8, 5 * 8, 1)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 80, 80, 1)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.slow
def test_v5_tta_param_sharing():
    # TTA reuses one core parameter set: identical tree to non-TTA.
    base = Config(
        model_name="EfficientLFNetV5", scale_factor=2, compute_dtype="float32",
        model_kwargs={"n_blocks": 2, "channels": 24, "d_state": 4},
    )
    tta = base.replace(
        model_kwargs={**base.model_kwargs, "use_tta": True}
    )
    n1, n2 = _params(base), _params(tta)
    assert n1 == n2
