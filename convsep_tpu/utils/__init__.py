"""Shared utilities: profiling/tracing helpers."""

from convsep_tpu.utils.profiling import trace, timeit_fetch

__all__ = ["trace", "timeit_fetch"]
