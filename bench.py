#!/usr/bin/env python
"""Headline benchmark: LF scenes/sec/chip at 5x5 4x SR (flagship model).

Scene geometry follows the HCI benchmark (512x512 HR per view -> 128x128
LR). Each model runs through its PRODUCTION eval mode: tiled 8x8 = 64
overlapping 160x160 SAI patches (patch 32, stride 16 in LR view space —
exactly the reference's evaluation geometry, option.py:40-46,
train.py:286-319), or — for models gated whole-scene-capable in the
registry (the flagship) — ONE un-tiled mirror-extended mosaic per scene,
which delivers the same SR output at equal-or-better PSNR (trained-
checkpoint gate, PERF.md round 3) without the overlap grid's 4x
per-pixel recompute. The reference tiles only to fit GPU memory.

``vs_baseline`` is the measured scenes/s divided by the PINNED round-1
number (0.8103 scenes/s, BENCH_r01.json) so progress across rounds is
visible — not a same-run comparison that can be gamed by construction.
(The r01 run timed a full-scene host fetch per queue; the scalar-reduce
probe here removes that tunnel artifact, worth roughly +5-10% of the
delta — the kernel work accounts for the rest, see PERF.md.)
Extra keys report patches/s and MFU (XLA-counted forward FLOPs against
the v5e bf16 peak) for roofline tracking.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Extra modes (VERDICT r2 #3 — zoo-wide TPU perf table):
    python bench.py --model_name EPIT [--minibatch 8] [--iters 3]
        one JSON line for that model (no vs_baseline pin)
    python bench.py --zoo
        benches every benchmark-zoo model, one JSON line each
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Round-1 measured throughput on one v5e chip — the fixed denominator.
BASELINE_R01_SCENES_PER_S = 0.8103
V5E_BF16_PEAK_FLOPS = 197e12

# The 17 published-benchmark models (SURVEY §2.5), registry names.
ZOO = [
    "VDSR", "EDSR", "RCAN", "resLF", "LFSSR", "LF_ATO", "LF_InterNet",
    "LF_DFnet", "MEG_Net", "LF_IINet", "DPT", "LFT", "DistgSSR",
    "LFSSR_SAV", "EPIT", "HLFSR", "LF_DET",
]


def bench_model(model_name: str, minibatch: int | None, iters: int,
                force_whole: bool | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from lfsr_tpu.config import Config
    from lfsr_tpu.models import registry
    from lfsr_tpu.models.registry import whole_scene_default
    from lfsr_tpu.train.evaluate import sr_scene

    ang, scale, h0 = 5, 4, 128
    cfg = Config(model_name=model_name, scale_factor=scale)
    if minibatch is not None:
        cfg = cfg.replace(minibatch_for_test=minibatch,
                          whole_scene_minibatch=minibatch)
    if force_whole is not None:
        cfg = cfg.replace(whole_scene_for_test=force_whole)
    model = registry.get_model(cfg)
    whole = whole_scene_default(cfg)  # production eval mode for this model
    rng = np.random.default_rng(0)
    # distinct inputs per iteration; on the axon tunnel block_until_ready
    # returns early, so timings queue N executions and fetch the last
    lrs = [
        jnp.asarray(rng.random((ang * h0, ang * h0)), jnp.float32)
        for _ in range(iters)
    ]
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 160, 160, 1), jnp.float32)
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    # forward FLOPs from XLA cost analysis (honest convention), counted on
    # the shape the production eval path actually runs: SAI-160 patches
    # (grid of 64 per scene) for tiled eval, one mirror-extended mosaic
    # per scene for whole-scene eval.
    if whole:
        in_sz = ang * (h0 + 2 * cfg.whole_scene_pad)
        flops_shape, flops_div = (1, in_sz, in_sz, 1), 1
    else:
        flops_shape, flops_div = (8, 160, 160, 1), 8
    comp = (
        jax.jit(model.apply)
        .lower(params, jnp.zeros(flops_shape, jnp.float32))
        .compile()
    )
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
    flops_unit = float(ca.get("flops", float("nan"))) / flops_div

    if whole:
        # production path: whole_scene_minibatch scenes per dispatch
        # (evaluate_sets whole-mode batching; r4 sweep: 4 scenes 3.807
        # vs 2 scenes 3.717 scenes/s, PERF.md)
        from lfsr_tpu.train.evaluate import _whole_batch_runner

        mb = max(1, cfg.whole_scene_minibatch)
        runner = _whole_batch_runner(
            model.apply, ang, ang, scale, cfg.whole_scene_pad
        )
        batches = [
            jnp.asarray(rng.random((mb, ang * h0, ang * h0)), jnp.float32)
            for _ in range(iters)
        ]
        scene_scalar = jax.jit(lambda p, b: jnp.sum(runner(p, b)))
        np.asarray(scene_scalar(params, batches[0]))  # compile + fetch
        t0 = time.perf_counter()
        outs = [scene_scalar(params, batches[i]) for i in range(iters)]
        np.asarray(outs[-1])
        scenes_per_sec = mb * iters / (time.perf_counter() - t0)
        return {
            "model": model_name,
            "scenes_per_sec": round(scenes_per_sec, 4),
            "mfu": round(
                scenes_per_sec * flops_unit / V5E_BF16_PEAK_FLOPS, 4
            ),
            "params": n_params,
            "minibatch_for_test": cfg.minibatch_for_test,
            "eval_mode": "whole_scene",
            "flops_per_scene_g": round(flops_unit / 1e9, 2),
        }
    else:
        kw = dict(
            ang=ang, scale=scale, patch=cfg.patch_size_for_test,
            stride=cfg.stride_for_test, minibatch=cfg.minibatch_for_test,
            h0=h0, w0=h0,
        )
        n_patches = 64  # 8x8 grid at this geometry
        flops_per_scene = flops_unit * n_patches

    # Each scene reduces to an on-device scalar: forces the whole SR
    # computation without timing the tunnel's multi-MB host fetch, which
    # a local chip would not pay (verify-skill scalar-probe pattern).
    scene_scalar = jax.jit(
        lambda p, s: jnp.sum(sr_scene(model.apply, p, s, **kw))
    )
    np.asarray(scene_scalar(params, lrs[0]))  # compile + fetch
    t0 = time.perf_counter()
    outs = [scene_scalar(params, lrs[i]) for i in range(iters)]
    np.asarray(outs[-1])  # fetch forces completion of the whole queue
    scene_s = (time.perf_counter() - t0) / iters
    scenes_per_sec = 1.0 / scene_s
    mfu = scenes_per_sec * flops_per_scene / V5E_BF16_PEAK_FLOPS
    return {
        "model": model_name,
        "scenes_per_sec": round(scenes_per_sec, 4),
        "mfu": round(mfu, 4),
        "params": n_params,
        "minibatch_for_test": cfg.minibatch_for_test,
        "eval_mode": "tiled",
        "patches_per_sec": round(n_patches * scenes_per_sec, 2),
        "flops_per_patch_g": round(flops_unit / 1e9, 2),
    }


def bench_train(model_name: str = "LFMambaX", batch: int = 8,
                steps: int = 6) -> dict:
    """Device-bound production train-step throughput (VERDICT r3 #5).

    The PRODUCTION step (Trainer._build_step: augmentation, composite
    loss, grad, AdamW update, in-step metrics — bf16, remat, donated
    state) on device-staged SAI-160 batches. Batches are pre-put on
    device so the number is the chip-bound steps/s a local host would
    see, not the axon tunnel's ~0.9 s/step H2D (PERF.md round 3).
    Warm-up is TWO steps: a donated-state jit recompiles on its second
    call (post-donation layouts differ from the init device_put layouts).
    """
    import jax
    import jax.numpy as jnp

    from lfsr_tpu.config import Config
    from lfsr_tpu.data.datasets import TrainArrays  # noqa: F401 (schema ref)
    from lfsr_tpu.train.trainer import Trainer

    cfg = Config(
        model_name=model_name, scale_factor=4, batch_size=batch,
        epochs=50, use_masked_pretrain=False,
    )
    rng = np.random.default_rng(0)
    tr = Trainer(cfg, steps_per_epoch=steps)
    state = tr.init_state(
        jax.random.key(0), rng.random((1, 160, 160, 1), np.float32)
    )
    fn = tr.step_fn(0)
    n_stage = max(4, min(steps, 8))
    lrs = [
        jax.device_put(rng.random((batch, 160, 160), np.float32))
        for _ in range(n_stage)
    ]
    hrs = [
        jax.device_put(rng.random((batch, 640, 640), np.float32))
        for _ in range(n_stage)
    ]
    ratio = jnp.float32(0.0)

    def one(i, st):
        return fn(st, lrs[i % n_stage], hrs[i % n_stage],
                  jax.random.fold_in(jax.random.key(1), i), ratio)

    state, m = one(0, state)   # compile
    state, m = one(1, state)   # post-donation recompile
    float(m["loss"])           # sync
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = one(2 + i, state)
    float(m["loss"])           # queue flush: fetch the final loss scalar
    dt = (time.perf_counter() - t0) / steps
    return {
        "model": model_name,
        "train_steps_per_sec": round(1.0 / dt, 4),
        "train_patches_per_sec": round(batch / dt, 2),
        "train_batch": batch,
        "train_step_ms": round(dt * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--minibatch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--zoo", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="bench the production train step only")
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--whole", action="store_true",
                    help="force whole-scene eval regardless of the "
                         "registry capability (gate measurements)")
    args = ap.parse_args()

    if args.train:
        print(json.dumps(bench_train(
            args.model_name or "LFMambaX", args.train_batch,
            args.iters or 6,
        )))
        return

    if args.zoo:
        for name in ZOO:
            try:
                r = bench_model(name, args.minibatch, args.iters or 3)
            except Exception as e:  # record, keep sweeping
                r = {"model": name, "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(r), flush=True)
        return

    if args.model_name and (args.model_name != "LFMambaX" or args.whole):
        print(json.dumps(bench_model(
            args.model_name, args.minibatch, args.iters or 6,
            force_whole=True if args.whole else None,
        )))
        return

    # Default / driver mode: the pinned flagship headline, ONE JSON line.
    r = bench_model("LFMambaX", args.minibatch, args.iters or 6)
    line = {
        "metric": "LF scenes/sec/chip (5x5 4x SR, 512x512 HR scene, LFMambaX)",
        "value": r["scenes_per_sec"],
        "unit": "scenes/s",
        "vs_baseline": round(
            r["scenes_per_sec"] / BASELINE_R01_SCENES_PER_S, 3
        ),
        "mfu": r["mfu"],
        "eval_mode": r["eval_mode"],
        "minibatch_for_test": r["minibatch_for_test"],
    }
    for k in ("patches_per_sec", "flops_per_patch_g", "flops_per_scene_g"):
        if k in r:
            line[k] = r[k]
    # Training throughput rides along in the driver JSON so a training
    # regression is bench-visible, not just an eval one (VERDICT r3 #5).
    try:
        line.update(bench_train("LFMambaX", 8, 4))
        line.pop("model", None)
    except Exception as e:
        line["train_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
