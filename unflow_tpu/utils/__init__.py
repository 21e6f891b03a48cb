"""Utilities: structured logging, timing, profiling hooks."""

from unflow_tpu.utils.logging import MetricsLogger

__all__ = ["MetricsLogger"]
