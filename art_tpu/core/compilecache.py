"""Persistent XLA compilation cache for long-lived batch processes.

The flagship develop program takes minutes to compile cold on the axon
TPU tunnel; the cache turns repeat launches (bench runs, batch daemons,
profiling loops) into second-scale loads. The reference has no analogue
(its C++ pipeline is AOT-compiled); this is a TPU-runtime concern.

This jaxlib's zstandard-compressed cache write segfaults on executables
above a few hundred MB (zstandard.backend_c inside
put_executable_and_time), so the module handle is nulled to force jax's
zlib fallback before the cache is enabled.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_artcache")


def enable(cache_dir: str | None = None, min_compile_secs: float = 2.0):
    """Enable the persistent compile cache (safe to call repeatedly)."""
    path = cache_dir or os.environ.get("ART_TPU_COMPILE_CACHE",
                                       _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        from jax._src import compilation_cache as _cc

        _cc.zstandard = None  # segfault guard: force zlib compression
        if hasattr(_cc, "zstd"):
            _cc.zstd = None
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        return True
    except Exception:
        return False
