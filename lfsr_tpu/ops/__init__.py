"""Numerics substrate: layout transforms, resampling, color, tiling, metrics."""

from lfsr_tpu.ops.layout import (  # noqa: F401
    sai_to_macpi,
    macpi_to_sai,
    sai_to_views,
    views_to_sai,
    views_to_macpi,
    macpi_to_views,
)
from lfsr_tpu.ops.color import rgb2ycbcr, ycbcr2rgb  # noqa: F401
from lfsr_tpu.ops.resize import imresize, imresize_jax, interpolate  # noqa: F401
from lfsr_tpu.ops.tiling import lf_divide, lf_integrate  # noqa: F401
from lfsr_tpu.ops.metrics import psnr, ssim, lf_metrics  # noqa: F401
