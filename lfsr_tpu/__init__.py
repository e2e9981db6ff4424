"""lfsr_tpu — TPU-native light-field image super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the BasicLFSR-derived NTIRE-2026
Track-2 (Efficiency) pipeline (reference: /root/reference). The compute path
is jit-compiled end to end: data augmentation, tiled evaluation, metrics,
losses, and every model live on device; parallelism is expressed with
`jax.sharding.Mesh` + `jit` sharding annotations rather than host loops.

Subpackages
-----------
- ``lfsr_tpu.config``   — frozen dataclass configuration (replaces the
  reference's import-time argparse global, option.py:36).
- ``lfsr_tpu.ops``      — numerics substrate: MATLAB-exact bicubic resize,
  BT.601 color, SAI/MacPI/EPI layouts, overlap tiling, PSNR/SSIM, selective
  scan, window attention.
- ``lfsr_tpu.models``   — registry-based model zoo (get_model/get_loss by
  name, mirroring the reference's importlib contract, train.py:48-50).
- ``lfsr_tpu.data``     — .mat→HDF5 generators and in-memory datasets.
- ``lfsr_tpu.train``    — trainer (AdamW, warm-up→cosine, bf16, orbax
  checkpoints), masked angular pre-training, tiled evaluation.
- ``lfsr_tpu.parallel`` — device mesh and sharding helpers.
- ``lfsr_tpu.tools``    — efficiency checker, BMP codec, submission
  packager/validator.
"""

__version__ = "0.1.0"
