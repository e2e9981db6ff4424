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


def test_flagship_param_tree_layout_frozen():
    """Checkpoint-compatibility pin for the flagship param tree.

    The IFE concat-fold rewrites changed submodule *construction order*;
    flax assigns auto-names in that order, so without explicit names the
    Conv_N paths permute and any earlier checkpoint fails to restore
    (ADVICE.md r2, medium). IFE now pins names to the original layout —
    this test freezes the (path, shape) pairs so future rewrites can't
    silently permute them again.
    """
    cfg = Config(model_name="LFMambaX", scale_factor=4, compute_dtype="float32")
    model = registry.get_model(cfg)
    x = jnp.zeros((1, ANG * 8, ANG * 8, 1), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x)

    ife = shapes["params"]["IFE_0"]
    got = {
        "/".join(k.key for k in kp): leaf.shape
        for kp, leaf in jax.tree_util.tree_flatten_with_path(ife)[0]
    }
    expect = {
        # original construction order: f3, f5-proj, 5x5 probe, f7-proj,
        # 7x7 probe, fuse, dw-enhance, final 1x1 (+ residual scale)
        "Conv_0/bias": (21,), "Conv_0/kernel": (3, 3, 1, 21),
        "Conv_1/bias": (21,), "Conv_1/kernel": (1, 1, 1, 21),
        "Conv_2/kernel": (5, 5, 1, 1),
        "Conv_3/bias": (22,), "Conv_3/kernel": (1, 1, 1, 22),
        "Conv_4/kernel": (7, 7, 1, 1),
        "Conv_5/kernel": (1, 1, 64, 64),
        "Conv_6/kernel": (3, 3, 1, 64),
        "Conv_7/kernel": (1, 1, 64, 64),
        "scale": (1,),
    }
    assert got == expect, got

    # top-level module layout stays fixed too
    top = sorted(shapes["params"].keys())
    assert top == sorted(
        ["IFE_0", "SpatialAttention_0", "LSFL_0", "ProgressiveFusion_0",
         "HLFR_0"]
        + [f"block_{i}" for i in range(12)]
        + [f"win_attn_{i}" for i in range(2)]
    ), top


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(registry.available()))
def test_forward_production_dtype(name):
    """Every registered model runs under the PRODUCTION compute dtype
    (bfloat16) — parity tests all pin float32, which let a bf16-only
    dtype mismatch in DPT's fold kernel reach the zoo bench unseen."""
    cfg = Config(model_name=name, scale_factor=4, model_kwargs=SMALL_KW)
    assert cfg.compute_dtype == "bfloat16"
    model = registry.get_model(cfg)
    h = ANG * 8
    x = jnp.asarray(np.random.default_rng(0).random((1, h, h, 1)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, h * 4, h * 4, 1)
    assert bool(jnp.all(jnp.isfinite(y)))
