"""Model zoo tests: published-param parity, forward shapes, jit, losses."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

ANG = 5

# Published 5x5 4xSR parameter counts (reference README.md:157-179,
# mirrored in BASELINE.md). Architecture parity gate: within 0.1%.
PUBLISHED_PARAMS = {
    "VDSR": 0.665e6,
    "EDSR": 38.89e6,
    "RCAN": 15.36e6,
    "LF_InterNet": 5.483e6,
    "DistgSSR": 3.582e6,
    "EPIT": 1.470e6,
    "LFT": 1.163e6,
    "LFSSR": 1.774e6,
    "LF_ATO": 1.364e6,
    "resLF": 8.646e6,
    "LF_IINet": 4.886e6,
    "MEG_Net": 1.775e6,
    "HLFSR": 13.87e6,
    "LF_DET": 1.687e6,
    "DPT": 3.778e6,
    "LFSSR_SAV": 1.543e6,
}

SMALL_KW = {"n_blocks": 2, "n_groups": 2, "channels": 32}


def _count_params(cfg):
    model = registry.get_model(cfg)
    x = jnp.zeros((1, ANG * 8, ANG * 8, 1), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x)
    return sum(math.prod(p.shape) for p in jax.tree.leaves(shapes))


@pytest.mark.parametrize("name,target", sorted(PUBLISHED_PARAMS.items()))
def test_param_count_matches_published(name, target):
    cfg = Config(model_name=name, scale_factor=4, compute_dtype="float32")
    n = _count_params(cfg)
    assert abs(n - target) / target < 1e-3, f"{name}: {n} vs published {target}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(PUBLISHED_PARAMS))
@pytest.mark.parametrize("scale", [2, 4])
def test_forward_shape_and_jit(name, scale):
    cfg = Config(
        model_name=name,
        scale_factor=scale,
        compute_dtype="float32",
        model_kwargs=SMALL_KW,
    )
    model = registry.get_model(cfg)
    h = ANG * 16
    x = jnp.asarray(np.random.default_rng(0).random((2, h, h, 1)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (2, h * scale, h * scale, 1)
    assert bool(jnp.all(jnp.isfinite(y)))
    loss = registry.get_loss(cfg)(y, jnp.zeros_like(y))
    assert bool(jnp.isfinite(loss))


def test_lf_dfnet_params_near_published():
    # The reference DFnet is dead code (exports Net, needs a CUDA DCN
    # package) so its exact count is unverifiable; the published table says
    # 3.990M and our TPU-native deformable conv lands within 0.2%.
    cfg = Config(model_name="LF_DFnet", scale_factor=4, compute_dtype="float32")
    n = _count_params(cfg)
    assert abs(n - 3.990e6) / 3.990e6 < 2e-3, n


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        registry.spec("NoSuchModel")
