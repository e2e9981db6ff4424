"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (the reference never
needed multi-device tests; we simulate the TPU mesh on CPU as SURVEY.md §4
prescribes).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would make every eager op a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
