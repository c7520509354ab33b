"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Multi-chip sharding tests run on the host platform with
``xla_force_host_platform_device_count`` (SURVEY §4: no fake collectives are
needed — the pipeline is batch-parallel only).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment pins JAX_PLATFORMS=axon (tunneled TPU) and the plugin wins
# over the env var set above in some import orders — force it via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated (most heavy
# tests rebuild the same develop programs). compilecache.enable() nulls
# the zstandard handle first — the zstd-compressed write segfaults on
# large executables with this jaxlib; the zlib fallback is safe.
from art_tpu.core import compilecache  # noqa: E402

compilecache.enable(os.path.expanduser("~/.cache/jax_artcache_tests"),
                    min_compile_secs=0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# The XLA CPU compiler segfaults deterministically after a few hundred
# in-process compilations (observed mid-suite in backend_compile_and_load;
# every test passes when its module runs alone). Dropping the executable
# caches between modules keeps the live-compilation footprint bounded.
_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    mod = request.module.__name__
    if _last_module[0] not in (None, mod):
        jax.clear_caches()
    _last_module[0] = mod
    yield
