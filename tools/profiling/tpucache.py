"""Profiling shim: enable the persistent JAX compile cache.

Import BEFORE compiling anything:

    import tools.profiling.tpucache  # noqa: F401
"""

from art_tpu.core import compilecache

compilecache.enable()
