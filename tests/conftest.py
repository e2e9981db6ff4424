"""Test harness: run everything on a virtual 8-device CPU mesh.

Two environment quirks to defeat (documented in
.claude/skills/verify/SKILL.md):
- the ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel),
  which would turn every eager op into a network round-trip;
- this interpreter *preloads jax at startup* (sitecustomize), so env vars
  set here are too late for jax's import-time config — the platform must
  be overridden through jax.config. XLA_FLAGS is still read lazily at
  backend initialization, so the 8-device CPU fan-out works as long as no
  backend has been touched yet (pytest plugins don't call jax.devices()).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# (--xla_backend_optimization_level=0 was tried here in r5: 507 -> 489 s,
# within noise — the suite is execution-, not compile-, dominated. Left
# at default; the multichip dryrun, which IS compile-dominated, uses it.)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), (
    f"tests must run on CPU, got {jax.devices()}"
)
