"""Dispatch-floor + bandwidth microbenchmarks at the 24MP bench shape.

Separates per-call dispatch overhead (the axon tunnel adds a fixed cost
per program launch) from real HBM traffic cost, so per-op standalone
timings (phase_prof.py) can be read correctly:

  - noop:       jitted 2-element slice of a resident array
  - copy_f32:   astype(f32) of the u16 CFA (144MB traffic)
  - scale:      apply_scale row-parity selects (current production)
  - scale_plane: (cfa - off)*sc with precomputed full planes (3x reads)
  - mults3x3:   3x3 matrix over (3,H,W) (576MB traffic)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 2),) if leaf.ndim else ()
    np.asarray(leaf[idx] if leaf.ndim else leaf)


def timeit(name, fn, *args, n=20, batches=3):
    _fence(fn(*args))
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _fence(out)
        best = min(best, (time.time() - t0) / n * 1000)
    print(f"{name:28s} {best:8.3f} ms")
    return best


def main():
    h, w = 4096, 6016
    rng = np.random.default_rng(0)
    cfa16 = jax.device_put(
        rng.integers(500, 16000, size=(h, w)).astype(np.uint16))
    off = jax.device_put(np.full((2, w), 512.0, np.float32))
    sc = jax.device_put(np.full((2, w), 4.1, np.float32))
    rgb = jax.device_put(
        rng.uniform(0, 65535, size=(3, h, w)).astype(np.float32))
    mat = jax.device_put(np.array(
        [[1.2, -0.1, -0.1], [-0.2, 1.3, -0.1], [0.05, -0.3, 1.25]],
        np.float32))

    timeit("noop_slice", jax.jit(lambda x: x[0, :2]), cfa16)

    timeit("copy_f32", jax.jit(lambda x: x.astype(jnp.float32)), cfa16)

    from art_tpu.raw.preprocess import apply_scale

    timeit("scale_selects",
           jax.jit(lambda x, o, s: apply_scale(
               x.astype(jnp.float32), o, s, jnp)), cfa16, off, sc)

    offp = jax.device_put(np.tile(np.full((2, w), 512.0, np.float32),
                                  (h // 2, 1)))
    scp = jax.device_put(np.tile(np.full((2, w), 4.1, np.float32),
                                 (h // 2, 1)))
    timeit("scale_fullplanes",
           jax.jit(lambda x, o, s: jnp.maximum(
               x.astype(jnp.float32) - o, 0.0) * s), cfa16, offp, scp)

    timeit("mults3x3",
           jax.jit(lambda p, m: jnp.einsum("ij,jhw->ihw", m, p)),
           rgb, mat)

    timeit("mults_diag",
           jax.jit(lambda p: p * jnp.array([2.1, 1.0, 1.4],
                                           jnp.float32)[:, None, None]),
           rgb)


if __name__ == "__main__":
    main()
