"""Persistent XLA compilation cache setup.

The whole-solve Pallas kernels take minutes to compile through the
remote-compile tunnel of axon-attached TPUs; caching by shape makes every
run after the first start in seconds. Callers that own a process (CLI,
benches, bench.py) should call :func:`enable_compilation_cache` before the
first compilation.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax
    cache_dir = cache_dir or os.environ.get(
        "MYCELIUM_TPU_JAX_CACHE", os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
