"""Utilities: profiler, seeding, metrics."""

from .profiler import Benchmark, get_bench

__all__ = ["Benchmark", "get_bench"]
