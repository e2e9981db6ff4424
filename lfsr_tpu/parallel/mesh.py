"""Device mesh + sharding for data-parallel LF-SR training.

The reference has no distributed training at all (SURVEY.md §2.8 — a
single GPU, `--local_rank` vestigial). The TPU-native design: a 1-D
``data`` mesh; parameters replicated, batches sharded on axis 0. Under
``jax.jit`` with these shardings XLA inserts the gradient ``psum`` over
ICI automatically — the sub-1M-param models need nothing fancier, and
eval patch grids shard the same way.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lfsr_tpu.config import Config


def make_mesh(cfg: Config | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = (cfg.mesh_shape if cfg and cfg.mesh_shape else (len(devices),))
    names = cfg.mesh_axis_names if cfg else ("data",)
    want = int(np.prod(shape))
    if want > len(devices):
        raise ValueError(f"mesh_shape {shape} needs {want} devices, have {len(devices)}")
    arr = np.asarray(devices[:want]).reshape(shape)
    return Mesh(arr, axis_names=names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / patch-grid) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
