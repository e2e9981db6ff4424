"""Tracing / profiling utilities (aux-subsystem parity, SURVEY.md §5).

The reference's observability was torch.cuda timers + fvcore tracing
(check_efficiency_official.py:306-341). TPU-native equivalents:
- ``trace(path)``: jax.profiler context writing a Perfetto/XProf trace;
- ``time_fn``: wall-time with warm-up. On the axon tunnel
  ``block_until_ready`` returns early, so completion is forced by
  fetching the last output to host;
- ``device_memory()``: per-device HBM stats;
- ``flops(fn, *args)``: XLA HLO cost analysis of the jitted function;
- ``debug_nans(enable)``: numerical sanitizer (the reference's only
  sanitizer was a NaN-loss skip, train.py:260-262).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lfsr_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> dict:
    """Mean wall time of a jitted fn with distinct queued executions."""
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "mean_ms": dt * 1e3, "per_s": 1.0 / dt}


def device_memory() -> dict:
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def flops(fn, *args) -> float | None:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca["flops"]) if ca and "flops" in ca else None


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
