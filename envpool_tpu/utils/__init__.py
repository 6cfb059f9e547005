"""Utilities: profiling and throughput measurement."""

from .profiling import fps_counter, trace

__all__ = ["fps_counter", "trace"]
