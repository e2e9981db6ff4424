"""Model registry: name -> (builder, loss builder).

Mirrors the reference's module contract — every model file exports
``get_model(args)`` / ``get_loss(args)`` and is loaded by name via
importlib (train.py:48-50, test.py:29-31) — but as an explicit decorator
registry instead of filesystem import magic, so the CLI surface
(``--model_name``) stays drop-in compatible while construction remains a
pure function of the Config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import flax.linen as nn

from lfsr_tpu.config import Config


@dataclass(frozen=True)
class ModelSpec:
    name: str
    build: Callable[[Config], nn.Module]
    build_loss: Callable[[Config], Callable]
    # Whole-scene (un-tiled) evaluation is this model's production default
    # on TPU: the model is fully convolutional (no geometry baked to the
    # 160x160 training patch) AND its whole-scene PSNR has been gated
    # against tiled eval on a trained checkpoint (PERF.md round 3). The
    # reference tiles only to fit GPU memory (train.py:307-313); its 32/16
    # overlap grid computes every output pixel 4x.
    whole_scene_ok: bool = False


_REGISTRY: Dict[str, ModelSpec] = {}


def register_model(
    name: str,
    loss: Callable[[Config], Callable] | None = None,
    whole_scene_ok: bool = False,
):
    """Class decorator: register a flax module under ``name``.

    The module's ``__init__`` must accept ``cfg: Config``. ``loss`` is a
    builder returning ``loss_fn(sr, hr) -> scalar``; defaults to L1 (the
    loss of every benchmark model, e.g. DistgSSR.py get_loss).
    ``whole_scene_ok`` marks un-tiled evaluation as the model's production
    default (used when Config.whole_scene_for_test is None = auto).
    """

    def deco(cls):
        from lfsr_tpu.models import losses

        build_loss = loss or losses.l1_builder
        _REGISTRY[name] = ModelSpec(
            name=name,
            build=lambda cfg: cls(cfg=cfg),
            build_loss=build_loss,
            whole_scene_ok=whole_scene_ok,
        )
        return cls

    return deco


def whole_scene_default(cfg: Config) -> bool:
    """Resolve the effective whole-scene-eval setting for this config:
    an explicit Config.whole_scene_for_test wins; None defers to the
    model's registry capability."""
    if cfg.whole_scene_for_test is not None:
        return bool(cfg.whole_scene_for_test)
    return spec(cfg.model_name).whole_scene_ok


def get_model(cfg: Config) -> nn.Module:
    return spec(cfg.model_name).build(cfg)


def get_loss(cfg: Config) -> Callable:
    return spec(cfg.model_name).build_loss(cfg)


def spec(name: str) -> ModelSpec:
    import lfsr_tpu.models  # noqa: F401 — triggers registration imports

    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available() -> list[str]:
    import lfsr_tpu.models  # noqa: F401

    return sorted(_REGISTRY)
