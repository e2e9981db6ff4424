"""Whole-scene tiled evaluation, batched and jitted.

The reference evaluates one 160x160 patch at a time with a cache flush per
step (train.py:307-313, ``minibatch_for_test=1`` + empty_cache at :311) —
the #1 throughput sink. Here the patch grid from ``lf_divide`` is padded
to a multiple of the device minibatch and processed with ``lax.map`` over
fixed-shape chunks inside ONE jit, then stitched by ``lf_integrate`` and
scored on device. Scenes are bucketed by their padded grid shape so each
distinct geometry compiles once.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.ops.metrics import lf_metrics
from lfsr_tpu.ops.tiling import (
    lf_divide,
    lf_integrate,
    lf_integrate_gaussian,
    tile_counts,
)


def _integrate(sr, ang_out, patch, scale, stride, h0, w0, integrate, sigma):
    """Dispatch the stitch: hard center crop (reference LFintegrate) or
    EPSW Gaussian blending (MyEfficientLFNetV4_3.py:148-216)."""
    if integrate == "gaussian":
        # sigma=None means "default" (patch/6, V4_3's sigma heuristic);
        # an explicit value must be positive — 0.0 is a config error,
        # not a request for the default (ADVICE r3).
        if sigma is None:
            sig = patch / 6.0
        else:
            sig = float(sigma)
            if not sig > 0:
                raise ValueError(f"epsw_sigma must be > 0, got {sigma!r}")
        return lf_integrate_gaussian(
            sr, ang_out, patch * scale, stride * scale, h0 * scale, w0 * scale,
            sigma=sig,
        )
    return lf_integrate(
        sr, ang_out, patch * scale, stride * scale, h0 * scale, w0 * scale
    )


def _whole_pad_batch(x, ang, whole_pad):
    """Mirror-extend each view of batched SAI mosaics [N, A*h0, A*w0] by
    ``whole_pad`` LR pixels so scene borders see the same symmetric
    continuation tiled eval gives them via lf_divide. Bottom/right pads
    round the padded view extent up to a multiple of 8 so the aligned
    Pallas kernel paths stay engaged at arbitrary scene geometries.

    The effective pad is clamped on tiny scenes (a symmetric pad larger
    than the view extent raises inside jit — ADVICE r3): views smaller
    than 8+pad LR px fall back to less/no padding rather than crashing.
    Returns ``(padded, p_used)``; ``p_used == 0`` means x is returned
    unchanged and no crop is needed after SR. This is the ONE home of the
    pad/crop algebra shared by sr_scene's whole mode and both whole-batch
    runners (previously triplicated)."""
    n_, H_, W_ = x.shape
    h0_, w0_ = H_ // ang, W_ // ang
    p = min(whole_pad, max(h0_ - 8, 0), max(w0_ - 8, 0))
    if p == 0:
        return x, 0
    pb = p + (-(h0_ + 2 * p) % 8)
    pr = p + (-(w0_ + 2 * p) % 8)
    v = x.reshape(n_, ang, h0_, ang, w0_)
    v = jnp.pad(v, ((0, 0), (0, 0), (p, pb), (0, 0), (p, pr)), mode="symmetric")
    return v.reshape(n_, ang * (h0_ + p + pb), ang * (w0_ + p + pr)), p


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "ang", "scale", "patch", "stride", "minibatch", "h0", "w0",
        "ang_out", "integrate", "integrate_sigma", "whole_pad", "whole",
    ),
)
def sr_scene(
    apply_fn: Callable,
    params,
    lr_sai: jnp.ndarray,  # [A*h0, A*w0]
    *,
    ang: int,
    scale: int,
    patch: int,
    stride: int,
    minibatch: int,
    h0: int,
    w0: int,
    ang_out: int | None = None,
    integrate: str = "crop",
    integrate_sigma: float | None = None,
    whole_pad: int = 0,
    whole: bool = False,
) -> jnp.ndarray:
    """Super-resolve one whole scene. Returns SR views
    [A_out, A_out, h0*s, w0*s]. For the RE (angular reconstruction) task
    pass scale=1 and ang_out > ang — the model maps [A*p, A*p] SAI
    patches to [A_out*p, A_out*p].

    ``whole=True`` selects whole-scene mode: the SAI mosaic is itself the
    single "patch" — no divide/integrate, no overlap redundancy (the
    reference's 32/16 grid computes every pixel 4x; it tiles only to fit
    GPU memory, train.py:307-313). This is EXPLICIT, not inferred from
    ``patch >= h0``: tiled eval where the configured patch covers a tiny
    scene must keep the reference's mirror-extended divide/integrate
    semantics (a geometric trigger silently flipped such scenes to raw
    un-tiled calls and cost -0.23 dB on 8x8-view scenes — caught by
    tests/test_train_efficacy.py in round 3)."""
    ang_out = ang_out or ang
    if whole:
        from lfsr_tpu.ops.layout import sai_to_views

        p_used = 0
        if whole_pad:
            padded, p_used = _whole_pad_batch(lr_sai[None], ang, whole_pad)
            lr_sai = padded[0]
        sr = apply_fn(params, lr_sai[None, ..., None])[0, ..., 0]
        out = sai_to_views(sr, ang_out)
        if p_used:
            ps = p_used * scale
            out = out[..., ps : ps + h0 * scale, ps : ps + w0 * scale]
        return out
    patches = lf_divide(lr_sai, ang, patch, stride)  # [N, A*p, A*p]
    n = patches.shape[0]
    n_pad = -(-n // minibatch) * minibatch
    patches = jnp.pad(patches, ((0, n_pad - n), (0, 0), (0, 0)))
    chunks = patches.reshape(n_pad // minibatch, minibatch, *patches.shape[1:])

    def run(chunk):
        return apply_fn(params, chunk[..., None])[..., 0]

    sr = jax.lax.map(run, chunks)
    sr = sr.reshape(n_pad, ang_out * patch * scale, ang_out * patch * scale)[:n]
    return _integrate(
        sr, ang_out, patch, scale, stride, h0, w0, integrate, integrate_sigma
    )


def sr_scene_sharded(
    apply_fn: Callable,
    params,
    lr_sai: jnp.ndarray,
    mesh,
    *,
    ang: int,
    scale: int,
    patch: int,
    stride: int,
    minibatch: int,
    h0: int,
    w0: int,
    ang_out: int | None = None,
    integrate: str = "crop",
    integrate_sigma: float | None = None,
    whole_pad: int = 0,  # accepted for kw-compat with sr_scene; unused (tiled)
    whole: bool = False,  # likewise; this entry point is always tiled
) -> jnp.ndarray:
    """Multi-chip tiled SR: the patch grid is data-parallel over ``mesh``.

    Each ``lax.map`` step processes ``n_devices * minibatch`` patches with
    the batch axis sharded across the mesh's ``data`` axis (params
    replicated) — XLA runs every chip on its own patch shard and the
    stitched output is gathered once at the end. Semantically identical
    to :func:`sr_scene` (same padding, same integrate), verified on an
    8-device CPU mesh in tests/test_eval_sharded.py.
    """
    ang_out = ang_out or ang
    n_dev = int(np.prod(mesh.devices.shape))
    step_b = n_dev * minibatch
    patches = lf_divide(jnp.asarray(lr_sai), ang, patch, stride)  # [N, A*p, A*p]
    n = patches.shape[0]
    n_pad = -(-n // step_b) * step_b
    patches = jnp.pad(patches, ((0, n_pad - n), (0, 0), (0, 0)))
    chunks = patches.reshape(n_pad // step_b, step_b, *patches.shape[1:])

    fn = _sharded_runner(
        apply_fn, mesh, ang_out, patch, scale, stride, h0, w0, n,
        integrate, integrate_sigma,
    )
    return fn(params, chunks)


@functools.lru_cache(maxsize=64)
def _sharded_runner(apply_fn, mesh, ang_out, patch, scale, stride, h0, w0, n,
                    integrate="crop", integrate_sigma=None):
    """Cached jitted data-parallel patch runner (one compile per mesh +
    scene geometry, mirroring sr_scene's static-argname bucketing)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P(None, "data"))

    def run_all(params_, chunks_):
        def run(chunk):
            return apply_fn(params_, chunk[..., None])[..., 0]

        n_pad = chunks_.shape[0] * chunks_.shape[1]
        sr = jax.lax.map(run, chunks_)
        sr = sr.reshape(n_pad, ang_out * patch * scale, ang_out * patch * scale)[:n]
        return _integrate(
            sr, ang_out, patch, scale, stride, h0, w0, integrate, integrate_sigma
        )

    return jax.jit(run_all, in_shardings=(repl, shard_b), out_shardings=repl)


def _make_whole_run(apply_fn, ang, ang_out, scale, whole_pad):
    """Scene-batch whole-scene SR body shared by the single-device and
    sharded runners: pad (via :func:`_whole_pad_batch`) -> one model call
    on the whole SAI batch -> views -> crop the pad back off."""

    def run(params_, sais_):  # [N, A*h0, A*w0]
        x = sais_
        h0_, w0_ = x.shape[1] // ang, x.shape[2] // ang
        p_used = 0
        if whole_pad:
            x, p_used = _whole_pad_batch(x, ang, whole_pad)
        sr = apply_fn(params_, x[..., None])[..., 0]
        n, H, W = sr.shape
        v = sr.reshape(n, ang_out, H // ang_out, ang_out, W // ang_out)
        v = jnp.moveaxis(v, 2, 3)  # [N, A, A, h, w]
        if p_used:
            ps = p_used * scale
            v = v[..., ps : ps + h0_ * scale, ps : ps + w0_ * scale]
        return v

    return run


@functools.lru_cache(maxsize=64)
def _whole_sharded_runner(apply_fn, mesh, ang, ang_out, scale, whole_pad):
    """Cached jitted scene-batch runner: whole scenes data-parallel over
    the mesh (params replicated). One compile per mesh + geometry.
    ``whole_pad`` applies the same per-view mirror extension as
    :func:`sr_scene`'s whole mode (border parity with tiled eval)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard_n = NamedSharding(mesh, P("data"))
    run = _make_whole_run(apply_fn, ang, ang_out, scale, whole_pad)
    return jax.jit(run, in_shardings=(repl, shard_n), out_shardings=repl)


@functools.lru_cache(maxsize=64)
def _whole_batch_runner(apply_fn, ang, ang_out, scale, whole_pad):
    """Single-device twin of :func:`_whole_sharded_runner`: one jitted
    scene-batch dispatch per geometry. Batching scenes amortizes the
    per-dispatch latency the B=1 whole-scene call pays — measured 388 ->
    335 ms/scene at [*,720,720] on v5e (PERF.md round 3)."""
    return jax.jit(_make_whole_run(apply_fn, ang, ang_out, scale, whole_pad))


def sr_scenes_whole(
    apply_fn, params, lr_sais, *, ang: int, ang_out: int,
    scale: int = 1, whole_pad: int = 0, minibatch: int = 2,
):
    """Whole-scene SR for a batch of same-geometry scenes on ONE device,
    ``minibatch`` scenes per dispatch (chunks queue asynchronously).
    ``lr_sais``: [N, A*h0, A*w0] -> [N, A_out, A_out, h0*s, w0*s]."""
    n = lr_sais.shape[0]
    mb = max(1, min(minibatch, n))
    n_pad = -(-n // mb) * mb
    sais = jnp.pad(jnp.asarray(lr_sais), ((0, n_pad - n), (0, 0), (0, 0)))
    fn = _whole_batch_runner(apply_fn, ang, ang_out, scale, whole_pad)
    outs = [
        fn(params, sais[i : i + mb]) for i in range(0, n_pad, mb)
    ]
    return jnp.concatenate(outs, axis=0)[:n]


def sr_scenes_whole_sharded(
    apply_fn, params, lr_sais, mesh, *, ang: int, ang_out: int,
    scale: int = 1, whole_pad: int = 0,
):
    """Whole-scene SR for a batch of same-geometry scenes, data-parallel
    across ``mesh``. ``lr_sais``: [N, A*h0, A*w0] (N padded to a multiple
    of the mesh size here). Returns [N, A_out, A_out, h0*s, w0*s].

    Whole-scene mode removes :func:`sr_scene_sharded`'s patch-grid
    parallelism (one call per scene, nothing to split), so multi-chip
    throughput comes from sharding the scene batch instead."""
    n_dev = int(np.prod(mesh.devices.shape))
    n = lr_sais.shape[0]
    n_pad = -(-n // n_dev) * n_dev
    sais = jnp.pad(jnp.asarray(lr_sais), ((0, n_pad - n), (0, 0), (0, 0)))
    out = _whole_sharded_runner(apply_fn, mesh, ang, ang_out, scale, whole_pad)(
        params, sais
    )
    return out[:n]


def evaluate_scene(apply_fn, params, scene, cfg: Config, mesh=None):
    """SR + metrics for one TestScene. Returns (psnr, ssim, sr_views).

    With a multi-device ``mesh`` the patch grid is data-parallel across
    it (sr_scene_sharded); otherwise single-device sr_scene.

    task='RE' evaluates angular reconstruction: spatial scale 1, output
    angRes_out views, metric protocol excluding the input view positions
    (utils/utils.py:110-131)."""
    ang = cfg.angRes
    re_task = cfg.task == "RE"
    s = 1 if re_task else cfg.scale_factor
    ang_out = cfg.angRes_out
    h0 = scene.lr_y.shape[0] // ang
    w0 = scene.lr_y.shape[1] // ang
    from lfsr_tpu.models.registry import whole_scene_default

    whole = whole_scene_default(cfg)
    kw = dict(
        ang=ang,
        scale=s,
        patch=max(h0, w0) if whole else cfg.patch_size_for_test,
        stride=max(h0, w0) if whole else cfg.stride_for_test,
        minibatch=cfg.minibatch_for_test,
        h0=h0,
        w0=w0,
        ang_out=ang_out,
        integrate="gaussian" if (cfg.epsw_for_test and not whole) else "crop",
        integrate_sigma=cfg.epsw_sigma,
        whole_pad=cfg.whole_scene_pad if whole else 0,
        whole=whole,
    )
    if whole:
        # one un-tiled call — nothing to shard across a data mesh
        sr_views = sr_scene(apply_fn, params, jnp.asarray(scene.lr_y), **kw)
    elif mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
        sr_views = sr_scene_sharded(
            apply_fn, params, jnp.asarray(scene.lr_y), mesh, **kw
        )
    else:
        sr_views = sr_scene(apply_fn, params, jnp.asarray(scene.lr_y), **kw)
    p, ssim_v = _score_views(scene, sr_views, ang, ang_out, s, re_task)
    return p, ssim_v, sr_views


def _score_views(scene, sr_views, ang, ang_out, s, re_task):
    """Metric tail shared by the per-scene and scene-batched paths."""
    h0 = scene.lr_y.shape[0] // ang
    w0 = scene.lr_y.shape[1] // ang
    sr_sai = jnp.moveaxis(sr_views, 2, 1).reshape(ang_out * h0 * s, ang_out * w0 * s)
    hr = jnp.asarray(scene.hr_y[: ang_out * h0 * s, : ang_out * w0 * s])
    if re_task:
        from lfsr_tpu.ops.metrics import lf_metrics_re

        p, ssim_v = lf_metrics_re(hr, sr_sai, ang, ang_out)
    else:
        p, ssim_v = lf_metrics(hr, sr_sai, ang)
    return float(p), float(ssim_v)


def evaluate_sets(apply_fn, params, scenes_by_set: dict, cfg: Config, log=print,
                  mesh=None):
    """Per-dataset averages (train.py:286-347 protocol). Returns dict.

    Pass a multi-device ``mesh`` to shard each scene's patch grid
    data-parallel across it."""
    from lfsr_tpu.models.registry import whole_scene_default

    whole_batched = whole_scene_default(cfg)
    multi = mesh is not None and int(np.prod(mesh.devices.shape)) > 1
    s_factor = 1 if cfg.task == "RE" else cfg.scale_factor
    results = {}
    for name, scenes in scenes_by_set.items():
        per_scene = []
        if whole_batched:
            # group same-geometry scenes: data-parallel over a multi-
            # device mesh, else minibatch_for_test scenes per dispatch on
            # one device (B=2 measured 13.7% faster per scene, PERF.md)
            by_geo: dict = {}
            for sc in scenes:
                by_geo.setdefault(sc.lr_y.shape, []).append(sc)
            scored = {}
            for group in by_geo.values():
                batch = jnp.stack([jnp.asarray(sc.lr_y) for sc in group])
                if multi:
                    views = sr_scenes_whole_sharded(
                        apply_fn, params, batch, mesh,
                        ang=cfg.angRes, ang_out=cfg.angRes_out,
                        scale=s_factor, whole_pad=cfg.whole_scene_pad,
                    )
                else:
                    views = sr_scenes_whole(
                        apply_fn, params, batch,
                        ang=cfg.angRes, ang_out=cfg.angRes_out,
                        scale=s_factor, whole_pad=cfg.whole_scene_pad,
                        minibatch=cfg.whole_scene_minibatch,
                    )
                for sc, v in zip(group, views):
                    scored[sc.name] = _score_views(
                        sc, v, cfg.angRes, cfg.angRes_out, s_factor,
                        cfg.task == "RE",
                    )
            for sc in scenes:
                p, s = scored[sc.name]
                per_scene.append((sc.name, p, s))
                log(f"  {name}/{sc.name}: PSNR {p:.3f} SSIM {s:.4f}")
            avg_p = float(np.mean([x[1] for x in per_scene]))
            avg_s = float(np.mean([x[2] for x in per_scene]))
            results[name] = {"psnr": avg_p, "ssim": avg_s, "scenes": per_scene}
            log(f"  {name} average: PSNR {avg_p:.3f} SSIM {avg_s:.4f}")
            continue
        for sc in scenes:
            p, s, _ = evaluate_scene(apply_fn, params, sc, cfg, mesh=mesh)
            per_scene.append((sc.name, p, s))
            log(f"  {name}/{sc.name}: PSNR {p:.3f} SSIM {s:.4f}")
        avg_p = float(np.mean([x[1] for x in per_scene]))
        avg_s = float(np.mean([x[2] for x in per_scene]))
        results[name] = {"psnr": avg_p, "ssim": avg_s, "scenes": per_scene}
        log(f"  {name} average: PSNR {avg_p:.3f} SSIM {avg_s:.4f}")
    return results
