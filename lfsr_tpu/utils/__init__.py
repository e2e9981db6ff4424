"""Logging, metric sheets, directory schema."""

from lfsr_tpu.utils.logging import Logger, MetricSheet, create_dirs  # noqa: F401
