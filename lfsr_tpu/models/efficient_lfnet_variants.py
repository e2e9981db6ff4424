"""Named configurations covering the remaining MyEfficientLFNet lineage.

The reference's V4.x / V6.x / V7 files are iterations on two shared
designs — the LF-VSSM dual-branch block line and its fusion/attention
heads — differing mainly in width, depth, state size, scan arity and which
attention heads are enabled (compare_v6_versions.py documents the V6 line;
docstrings of each reference file state the deltas).

Status of the line:

- V6.0 / V6.1 — TRUE architectures (efficient_lfnet_v6.py) with exact
  FastConvSSM-fallback param parity (557,628 / 557,516).
- V6.3 — TRUE architecture (efficient_lfnet_v63.py), exact 408,494 params
  vs the reference under the mamba shim.
- V6.5 (MyEfficientLFNetV6_5.py:80-84, 142-156) — V6.4's exact module set
  at channels 72 x 10 blocks, d_state 24, with a 3-layer deep
  reconstruction; registered here as the V64 architecture with those
  knobs. Exact param parity: 756,093.
- V6.6 and V7 are full architectures in efficient_lfnet_v7.py; V4.5 in
  efficient_lfnet_v4_5.py.
"""

from __future__ import annotations

from lfsr_tpu.config import Config
from lfsr_tpu.models import losses
from lfsr_tpu.models.registry import _REGISTRY, ModelSpec
from lfsr_tpu.models.efficient_lfnet_v64 import EfficientLFNetV64


def _variant(name: str, base_cls, defaults: dict, loss_builder):
    """Register ``name`` as ``base_cls`` with default model_kwargs."""

    def build(cfg: Config):
        merged = {**defaults, **cfg.model_kwargs}
        return base_cls(cfg=cfg.replace(model_kwargs=merged))

    _REGISTRY[name] = ModelSpec(name=name, build=build, build_loss=loss_builder)


_variant(
    "EfficientLFNetV6_5",
    EfficientLFNetV64,
    {"channels": 72, "n_blocks": 10, "d_state": 24, "expand": 1.25,
     "refine_layers": 3},
    losses.composite_v64_builder,
)
