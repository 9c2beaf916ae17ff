"""Process-level runtime setup shared by the CLIs and benchmarks."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Persist XLA compilations across processes.

    TPU compiles of the detection graph take O(minutes); the cache turns
    repeat CLI invocations with the same block shape into millisecond
    loads. Respects an explicit JAX_COMPILATION_CACHE_DIR.
    """
    import jax

    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.expanduser("~/.cache/mustache_tpu/jax"))
    # the cache is a pure optimization: an unwritable HOME (read-only
    # container, service account) must not crash CLI startup
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache
