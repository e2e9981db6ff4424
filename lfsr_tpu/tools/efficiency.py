"""Track-2 efficiency gate: params, FLOPs, latency, memory.

TPU-native equivalent of check_efficiency_official.py:
- constraints: <1,000,000 params and <20 GFLOPs at SAI input
  [1, 1, 160, 160] (check_efficiency_official.py:35-39);
- parameter count with a per-module breakdown (:87-121);
- FLOPs from XLA's own HLO cost analysis (`compiled.cost_analysis()`),
  replacing fvcore JIT tracing (:124-167). **Convention note** (SURVEY.md
  §7 hard-part 4): fvcore counts multiply-accumulates (1 MAC = 1 FLOP);
  XLA counts 2 FLOPs per MAC. The gate therefore compares
  ``xla_flops / 2`` against the 20 G budget and reports both numbers;
- latency benchmark with warm-up + block_until_ready (:306-330);
- device memory from jax memory_stats (:333-341).
"""

from __future__ import annotations

import math
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from lfsr_tpu.config import Config
from lfsr_tpu.models import registry

PARAM_LIMIT = 1_000_000
FLOPS_LIMIT = 20e9  # MAC convention, matching fvcore / the challenge gate
OFFICIAL_INPUT = (1, 160, 160, 1)  # NHWC of the official [1,1,160,160]


def count_params(params) -> tuple[int, dict[str, int]]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_module = defaultdict(int)
    total = 0
    for path, leaf in flat:
        n = math.prod(leaf.shape)
        total += n
        top = next(
            (p.key for p in path if hasattr(p, "key") and p.key != "params"), "other"
        )
        by_module[str(top)] += n
    return total, dict(by_module)


_SCOPE_RE = None


def _module_key(stack: str) -> str:
    """Group a jaxpr name-stack ('Model/block_0/SS2D_0/...') to the same
    top-level module key the parameter breakdown uses ('block_0').

    Transform frames (jit(einsum) specs like '...i,oi->...o', vmap/remat
    wrappers) are not flax scopes — they are filtered out so work done by
    helper jits at model top level lands in '(top)', not under a
    pseudo-module named after an einsum spec."""
    global _SCOPE_RE
    if _SCOPE_RE is None:
        import re

        _SCOPE_RE = re.compile(r"^[A-Za-z0-9_.]+$")
    parts = [p for p in stack.split("/") if p and _SCOPE_RE.match(p)]
    return parts[1] if len(parts) >= 2 else "(top)"


def fvcore_macs_detailed(fn, *args) -> tuple[int, dict[str, int]]:
    """Analytic MAC count under the OFFICIAL (fvcore) convention, with a
    per-module breakdown (reference ``--detailed``,
    check_efficiency_official.py:456-463 / check_efficiency_detailed.py).

    The CodaBench gate runs fvcore (check_efficiency_official.py:124-167),
    which counts only conv / linear / matmul MACs and skips elementwise
    ops, activations, normalizations, FFTs, and custom ops such as the
    mamba selective scan (:156-162). This walker reproduces that coverage
    on the jaxpr: ``conv_general_dilated`` and ``dot_general`` are
    counted (1 MAC = 1 "FLOP" in fvcore units), everything else —
    including the Pallas scan custom-call — is skipped, exactly as fvcore
    skips the CUDA mamba op. Inner jaxprs (pjit/remat/custom_vjp) are
    recursed; ``scan`` bodies are multiplied by trip count.

    Attribution uses each equation's flax scope name-stack, so the
    breakdown keys match :func:`count_params`'s and the per-module values
    sum EXACTLY to the total (pinned in tests/test_efficiency.py).
    """
    closed = jax.make_jaxpr(fn)(*args)
    by_module: dict[str, int] = defaultdict(int)

    def count(jaxpr, prefix: str, mult: int) -> int:
        total = 0
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            stack = prefix + "/" + str(eqn.source_info.name_stack)
            macs = 0
            if name == "conv_general_dilated":
                out = eqn.outvars[0].aval
                rhs = eqn.invars[1].aval
                dn = eqn.params["dimension_numbers"]
                # XLA rhs already has input-feature dim = Cin/groups
                cin_g = rhs.shape[dn.rhs_spec[1]]
                spatial = math.prod(
                    rhs.shape[d] for d in dn.rhs_spec[2:]
                )
                macs = math.prod(out.shape) * cin_g * spatial
            elif name == "dot_general":
                (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
                lhs = eqn.invars[0].aval
                rhs = eqn.invars[1].aval
                k = math.prod(lhs.shape[d] for d in lc)
                b = math.prod(lhs.shape[d] for d in lb)
                m = math.prod(lhs.shape) // max(1, k * b)
                n = math.prod(rhs.shape) // max(
                    1, math.prod(rhs.shape[d] for d in rc) * math.prod(rhs.shape[d] for d in rb)
                )
                macs = b * m * n * k
            elif name == "scan":
                total += count(
                    eqn.params["jaxpr"].jaxpr, stack, mult * eqn.params["length"]
                )
            else:
                for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                    sub = eqn.params.get(key)
                    if sub is not None:
                        total += count(getattr(sub, "jaxpr", sub), stack, mult)
                        break
            if macs:
                by_module[_module_key(stack)] += macs * mult
                total += macs * mult
        return total

    # the outermost prefix is empty: top-level eqn stacks already start
    # with the model scope ('EfficientLFNetV63/...')
    total = count(closed.jaxpr, "", 1)
    return total, dict(by_module)


def fvcore_macs(fn, *args) -> int:
    """Total-only wrapper of :func:`fvcore_macs_detailed`."""
    return fvcore_macs_detailed(fn, *args)[0]


def xla_flops(apply_fn, params, x) -> float | None:
    compiled = jax.jit(apply_fn).lower(params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", float("nan"))) if ca else None


def latency_bench(apply_fn, params, x, warmup=5, iters=50) -> dict:
    """Measure queued throughput and per-call latency separately.

    ``throughput_ms`` queues `iters` calls with one final sync (how the
    tiled evaluator actually drives the chip); ``latency_ms`` syncs every
    call (true single-dispatch latency, reference
    check_efficiency_official.py:306-330 semantics).
    """
    fn = jax.jit(apply_fn)
    for _ in range(warmup):
        fn(params, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    out.block_until_ready()
    queued = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(params, x).block_until_ready()
    synced = (time.perf_counter() - t0) / iters
    return {
        "throughput_ms": queued * 1e3,
        "latency_ms": synced * 1e3,
        "throughput_per_s": 1.0 / queued,
    }


def memory_stats() -> dict:
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        }
    except Exception:
        return {}


def check_efficiency(cfg: Config, bench: bool = False, input_shape=OFFICIAL_INPUT) -> dict:
    model = registry.get_model(cfg)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    params = variables
    # The official gate counts only named_parameters
    # (check_efficiency_official.py count_parameters); non-trainable
    # collections such as batch_stats (BN running mean/var) are reported
    # separately, not against the 1M limit.
    other_collections = {}
    if isinstance(variables, dict) and "params" in variables:
        params = {"params": variables["params"]}
        other_collections = {
            k: count_params(v)[0] for k, v in variables.items() if k != "params"
        }
    total, breakdown = count_params(params)

    flops2 = xla_flops(model.apply, variables, x)
    macs = flops2 / 2.0 if flops2 else None
    official, flops_breakdown = fvcore_macs_detailed(model.apply, variables, x)

    report = {
        "model": cfg.model_name,
        "input_shape": list(input_shape),
        "params": total,
        "non_trainable": other_collections,
        "params_limit": PARAM_LIMIT,
        "params_pass": total < PARAM_LIMIT,
        "param_breakdown": dict(sorted(breakdown.items(), key=lambda kv: -kv[1])),
        "xla_flops": flops2,
        "flops_mac_convention": macs,
        # the number CodaBench's fvcore gate would see (conv/matmul MACs
        # only; scan and elementwise ops skipped)
        "official_fvcore_macs": official,
        # per-module MACs (fvcore convention, reference --detailed) —
        # full dict, values sum exactly to official_fvcore_macs
        "flops_breakdown": dict(
            sorted(flops_breakdown.items(), key=lambda kv: -kv[1])
        ),
        "official_pass": official < FLOPS_LIMIT,
        "flops_limit": FLOPS_LIMIT,
        "flops_pass": (macs is not None) and (macs < FLOPS_LIMIT),
        "output_shape_pass": None,
    }

    y = jax.eval_shape(model.apply, variables, x)
    s = cfg.scale_factor
    report["output_shape_pass"] = tuple(y.shape) == (
        input_shape[0], input_shape[1] * s, input_shape[2] * s, input_shape[3],
    )

    if bench:
        report["latency"] = latency_bench(model.apply, variables, x)
        report["memory"] = memory_stats()

    # The submission gate is the official (fvcore-convention) count — the
    # honest XLA count is reported alongside for engineering decisions.
    report["verdict"] = bool(
        report["params_pass"] and report["official_pass"] and report["output_shape_pass"]
    )
    return report


def format_report(r: dict, detailed: bool = False) -> str:
    lines = [
        f"model: {r['model']}  input {r['input_shape']}",
        f"params: {r['params']:,} / {r['params_limit']:,}  "
        f"[{'PASS' if r['params_pass'] else 'FAIL'}]",
    ]
    if detailed:
        lines.append("per-module breakdown (params | official MACs):")
        flops = r.get("flops_breakdown", {})
        mods = dict(r.get("param_breakdown", {}))
        for name in sorted(set(mods) | set(flops),
                           key=lambda n: -flops.get(n, 0)):
            lines.append(
                f"  {name:<28s} {mods.get(name, 0):>10,}  "
                f"{flops.get(name, 0) / 1e9:>8.3f} G"
            )
    if r["flops_mac_convention"] is not None:
        lines.append(
            f"flops (MAC conv.): {r['flops_mac_convention']/1e9:.2f} G / "
            f"{r['flops_limit']/1e9:.0f} G  [{'PASS' if r['flops_pass'] else 'FAIL'}]"
            f"   (xla raw: {r['xla_flops']/1e9:.2f} G)"
        )
    lines.append(
        f"flops (official fvcore conv.): {r['official_fvcore_macs']/1e9:.2f} G / "
        f"{r['flops_limit']/1e9:.0f} G  [{'PASS' if r['official_pass'] else 'FAIL'}]"
    )
    lines.append(f"output shape: [{'PASS' if r['output_shape_pass'] else 'FAIL'}]")
    if "latency" in r:
        lines.append(
            f"latency: {r['latency']['latency_ms']:.2f} ms/call  "
            f"queued: {r['latency']['throughput_ms']:.2f} ms  "
            f"({r['latency']['throughput_per_s']:.1f} patches/s)"
        )
    lines.append(f"VERDICT: {'PASS' if r['verdict'] else 'FAIL'}")
    return "\n".join(lines)
