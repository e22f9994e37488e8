"""Utilities: logging, profiling."""

from xfmr_rec_tpu.utils.logging import MetricsLogger

__all__ = ["MetricsLogger"]
