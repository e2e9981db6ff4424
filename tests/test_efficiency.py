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


def test_fvcore_macs_oracles():
    """Analytic official-convention counter vs hand-computed MACs."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from lfsr_tpu.models.common import conv
    from lfsr_tpu.tools.efficiency import fvcore_macs

    m = conv(16, 3, padding=1)
    x = jnp.zeros((1, 32, 32, 4))
    p = m.init(jax.random.key(0), x)
    assert fvcore_macs(m.apply, p, x) == 32 * 32 * 16 * 4 * 9

    d = nn.Dense(7)
    xd = jnp.zeros((5, 11))
    assert fvcore_macs(d.apply, d.init(jax.random.key(0), xd), xd) == 5 * 11 * 7

    g = conv(8, 3, padding=1, groups=4)
    xg = jnp.zeros((1, 16, 16, 8))
    assert fvcore_macs(g.apply, g.init(jax.random.key(1), xg), xg) == 16 * 16 * 8 * 2 * 9


def test_check_efficiency_reports_official_and_honest():
    from lfsr_tpu.config import Config
    from lfsr_tpu.tools.efficiency import check_efficiency

    r = check_efficiency(
        Config(model_name="DistgSSR", scale_factor=4, compute_dtype="float32",
               model_kwargs={"channels": 16, "n_groups": 1, "n_blocks": 1}),
        input_shape=(1, 40, 40, 1),
    )
    assert r["official_fvcore_macs"] > 0
    # conv-only model: XLA/2 (MAC convention) should be close to the
    # official count — elementwise ops are the only divergence
    assert abs(r["flops_mac_convention"] - r["official_fvcore_macs"]) / r[
        "official_fvcore_macs"
    ] < 0.2


@pytest.mark.slow
def test_flops_breakdown_sums_to_total():
    """Per-module FLOPs breakdown (reference --detailed parity): the
    name-stack attributed per-module MACs must sum EXACTLY to the total,
    keys must match the param-breakdown convention, and a scan/remat-free
    flagship-class model must attribute its Mamba dense work to the
    blocks."""
    from lfsr_tpu.config import Config
    from lfsr_tpu.tools.efficiency import check_efficiency

    r = check_efficiency(
        Config(model_name="EfficientLFNetV6_3", scale_factor=4,
               compute_dtype="float32",
               model_kwargs={"n_blocks": 2, "channels": 8, "d_state": 4,
                             "remat": False}),
        input_shape=(1, 40, 40, 1),
    )
    bd = r["flops_breakdown"]
    assert sum(bd.values()) == r["official_fvcore_macs"]
    assert "block_0" in bd and bd["block_0"] > 0
    # every FLOPs module key is a param module key (same grouping)
    unparam = set(bd) - set(r["param_breakdown"]) - {"(top)"}
    assert not unparam, unparam
