"""Named configurations covering the remaining MyEfficientLFNet lineage.

The reference's V4.x / V6.x / V7 files are iterations on two shared
designs — the LF-VSSM dual-branch block line and its fusion/attention
heads — differing mainly in width, depth, state size, scan arity and which
attention heads are enabled (compare_v6_versions.py documents the V6 line;
docstrings of each reference file state the deltas). Rather than duplicate
near-identical architectures, each version registers here as a documented
configuration of the closest implemented architecture:

- V6   (MyEfficientLFNetV6.py: 56ch x 8 LF-VSSM, d_state 24)
- V6.1 (V6_1.py: audit — d_state 24->16, expand 1.5->1.25, 2-way scan)
- V6.3 (V6_3.py: the FLOPs-rescued V6.2 — depthwise-separable upsampler,
  CASAI/degradation/semantic/spectral heads == V6.4's stage list)
- V6.5 (V6_5.py: 72ch x 10 blocks, d_state 24)
  -> maps onto the V64 architecture with the stated knobs.

V6.6 and V7 are full architectures in efficient_lfnet_v7.py (grouped
4-way cross-scan, DCT spectral attention, staged fusion, edge-aware
reconstruction) — no longer aliases. V4.5 is a full architecture in
efficient_lfnet_v4_5.py.

Differences that are NOT reproduced are noted per entry; exact param
parity is not claimed for these aliases (the reference publishes only
approximate counts for them).
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


# V6.0 / V6.1 are TRUE architectures now (efficient_lfnet_v6.py, with
# FastConvSSM-fallback param parity vs the reference files); only the
# V6.3 / V6.5 mamba_ssm-gated line remains configured on V64 below.
_variant(
    "EfficientLFNetV6_3",
    EfficientLFNetV64,
    {"channels": 64, "n_blocks": 8, "d_state": 16, "expand": 1.25},
    losses.composite_v64_builder,
)
_variant(
    "EfficientLFNetV6_5",
    EfficientLFNetV64,
    {"channels": 72, "n_blocks": 10, "d_state": 24, "expand": 1.25},
    losses.composite_v64_builder,
)
