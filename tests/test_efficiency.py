"""Track-2 efficiency gate: the flagship and V-series must pass <1M params
(and report FLOPs). Full-FLOPs compile check runs at a reduced input to
keep CPU test time sane; the param gate is exact."""

import math

import jax
import jax.numpy as jnp
import pytest

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry
from lfsr_tpu.tools.efficiency import count_params, PARAM_LIMIT

CHALLENGE_MODELS = ["LFMambaX", "EfficientLFNetV2", "EfficientLFNetV64"]


@pytest.mark.parametrize("name", CHALLENGE_MODELS)
def test_param_gate(name):
    cfg = Config(model_name=name, scale_factor=4, compute_dtype="float32")
    model = registry.get_model(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
    )
    params = shapes["params"] if "params" in shapes else shapes
    n = sum(math.prod(p.shape) for p in jax.tree.leaves(params))
    assert n < PARAM_LIMIT, f"{name}: {n} params >= 1M gate"


def test_count_params_breakdown():
    cfg = Config(
        model_name="VDSR", scale_factor=2, compute_dtype="float32",
        model_kwargs={"n_layers": 2, "channels": 8},
    )
    model = registry.get_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 40, 40, 1)))
    total, breakdown = count_params(variables)
    assert total == sum(breakdown.values())
