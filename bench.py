#!/usr/bin/env python
"""Headline benchmark: LF scenes/sec/chip at 5x5 4x SR (flagship model).

Scene geometry follows the HCI benchmark (512x512 HR per view -> 128x128
LR), tiled into 8x8 = 64 overlapping 160x160 SAI patches (patch 32,
stride 16 in LR view space) — exactly the reference's evaluation geometry
(option.py:40-46, train.py:286-319).

Two measurements on the SAME device:
- ``batched``: this framework's path — one jit over the whole patch grid
  (lf_divide -> lax.map over minibatches -> lf_integrate).
- ``reference-pattern``: the reference's execution shape — one 160x160
  patch per dispatch with a host sync after each (train.py:307-313,
  minibatch_for_test=1 + per-step cache flush). This is the honest
  vs_baseline denominator available without CUDA hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lfsr_tpu.config import Config
    from lfsr_tpu.models import registry
    from lfsr_tpu.ops.tiling import lf_divide
    from lfsr_tpu.train.evaluate import sr_scene

    ang, scale, h0 = 5, 4, 128
    cfg = Config(
        model_name="LFMambaX", scale_factor=scale, minibatch_for_test=8
    )
    model = registry.get_model(cfg)
    rng = np.random.default_rng(0)
    # distinct inputs per iteration; on the axon tunnel block_until_ready
    # returns early, so timings queue N executions and fetch the last
    iters = 5
    lrs = [
        jnp.asarray(rng.random((ang * h0, ang * h0)), jnp.float32)
        for _ in range(iters)
    ]
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32))

    kw = dict(
        ang=ang, scale=scale, patch=cfg.patch_size_for_test,
        stride=cfg.stride_for_test, minibatch=cfg.minibatch_for_test,
        h0=h0, w0=h0,
    )

    # --- batched (ours) ---
    np.asarray(sr_scene(model.apply, params, lrs[0], **kw))  # compile + fetch
    t0 = time.perf_counter()
    outs = [sr_scene(model.apply, params, lrs[i], **kw) for i in range(iters)]
    np.asarray(outs[-1])  # fetch forces completion of the whole queue
    batched_scene_s = (time.perf_counter() - t0) / iters
    scenes_per_sec = 1.0 / batched_scene_s

    # --- reference execution pattern: one patch per dispatch
    # (minibatch_for_test=1, train.py:307-313), same device. Dispatches are
    # queued and the last is fetched, so this measures unbatched device
    # time without penalizing the tunnel's per-transfer latency.
    patches = lf_divide(lrs[0], ang, cfg.patch_size_for_test, cfg.stride_for_test)
    one = jax.jit(model.apply)
    np.asarray(one(params, patches[:1][..., None]))
    n = patches.shape[0]
    t0 = time.perf_counter()
    ys = [one(params, patches[i : i + 1][..., None]) for i in range(n)]
    np.asarray(ys[-1])
    ref_scene_s = time.perf_counter() - t0
    ref_scenes_per_sec = 1.0 / ref_scene_s

    print(
        json.dumps(
            {
                "metric": "LF scenes/sec/chip (5x5 4x SR, 512x512 HR scene, LFMambaX)",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / ref_scenes_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
