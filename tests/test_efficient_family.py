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


def test_v6_conv_fallback_param_parity():
    """The true V6.0/V6.1 architectures reproduce the reference files'
    FastConvSSM-fallback parameter counts EXACTLY (MyEfficientLFNetV6.py /
    V6_1.py instantiated on CPU torch; the 112-param gap is V6.0's
    top-level fuse_norm LayerNorm)."""
    for name, expect in [
        ("EfficientLFNetV6", 557_628), ("EfficientLFNetV6_1", 557_516),
    ]:
        cfg = Config(
            model_name=name, scale_factor=4,
            compute_dtype="float32", model_kwargs={"ssm_impl": "conv"},
        )
        assert _params(cfg) == expect, (name, _params(cfg))


def test_v6_3_v6_5_exact_reference_param_parity():
    """V6.3 is now a TRUE architecture (efficient_lfnet_v63.py) and V6.5
    the exact V64 geometry (channels 72 x 10 blocks, d_state 24,
    refine_layers 3). Reference counts measured by instantiating
    MyEfficientLFNetV6_3/V6_5 under the parameter-exact mamba_ssm shim
    (tests/_torch_ref.install_mamba_shim): EXACT parity on both —
    408,494 / 756,093. Both stay under the 1M Track-2 gate."""
    for name, expect in [
        ("EfficientLFNetV6_3", 408_494), ("EfficientLFNetV6_5", 756_093),
    ]:
        cfg = Config(model_name=name, scale_factor=4, compute_dtype="float32")
        n = _params(cfg)
        assert n == expect, (name, n)
        assert n < 1_000_000
