"""Per-stage timings for the AMaZE Pallas kernels (run on the real chip)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)])


def timeit(name, fn, *args, n=10):
    _fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from art_tpu.demosaic import amaze_pallas as ap

    h, w = 4096, 6144  # padded bench shape
    rng = np.random.default_rng(0)
    cfa = jnp.asarray(rng.uniform(500, 60000, (h, w)).astype(np.float32))
    clip_pt, clip_pt8 = 65535.0, 65535.0 * 0.8

    x = cfa * (1.0 / 65535.0)
    clips = jnp.stack([jnp.asarray(clip_pt, jnp.float32),
                       jnp.asarray(clip_pt8, jnp.float32)]).reshape(1, 2)
    mk = functools.partial(ap._stage_call, pattern="RGGB", shape=(h, w),
                           dtype=x.dtype, interpret=False)
    xp = jax.jit(ap._padh)(x)
    _fence(xp)

    k1 = jax.jit(mk(1, [1], 3))
    s1 = k1(clips, xp)
    _fence(s1)
    timeit("K1 (stages 1-4)", k1, clips, xp)

    k2 = jax.jit(mk(2, [1, 3], 2))
    s2 = k2(clips, xp, s1)
    _fence(s2)
    timeit("K2 (stages 5-6)", k2, clips, xp, s1)

    k3 = jax.jit(mk(3, [1, 2], 1, final=True))
    rgb = k3(clips, xp, s2)
    _fence(rgb)
    timeit("K3 (stages 7-8)", k3, clips, xp, s2)

    timeit("pad", jax.jit(ap._padh), x)
    timeit("FULL amaze _run",
           lambda c: ap._run(c, "RGGB", 65535.0, 65535.0 * 0.8), cfa)


if __name__ == "__main__":
    main()
