"""Utilities: profiler, seeding, metrics."""

from .profiler import Benchmark, get_bench

__all__ = ["Benchmark", "get_bench"]


def enable_compile_cache(path: str = None) -> str:
    """Point JAX's persistent compilation cache at the repo-local
    .jax_cache (conftest.py does the same for tests). Through the axon
    remote-compile tunnel a cold compile of a KD train step is tens of
    minutes — every entrypoint that might re-run (trainers, experiment
    scripts, bench) should call this first."""
    import os

    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
