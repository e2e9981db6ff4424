"""Device mesh and sharding helpers."""

from lfsr_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
