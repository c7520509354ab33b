"""Enable a persistent JAX compilation cache for TPU profiling runs.

The zstandard-compressed cache write segfaults on large executables with
this jaxlib (zstandard.backend_c in put_executable_and_time), so we force
the zlib fallback by nulling the module handle inside jax's cache module.

Import this BEFORE compiling anything:

    import tools.profiling.tpucache  # noqa: F401
"""

import os

os.makedirs("/root/.cache/jax_artcache", exist_ok=True)

import jax  # noqa: E402
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.zstandard = None
if hasattr(_cc, "zstd"):
    _cc.zstd = None

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_artcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
