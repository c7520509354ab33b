"""Sweep AMaZE Pallas tile sizes at the padded bench shape (real chip).

Halo overhead per (TY, TX): (TY+32)(TX+256) / (TY*TX). Larger tiles cut
overhead but grow the VMEM windows and Mosaic compile time; this measures
the actual _run wall-clock for candidate combos.
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
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)])


def main():
    from art_tpu.demosaic import amaze_pallas as ap

    h, w = 4096, 6144
    rng = np.random.default_rng(0)
    cfa = jnp.asarray(rng.uniform(500, 60000, (h, w)).astype(np.float32))

    combos = [(256, 2048), (512, 2048), (256, 3072), (512, 3072),
              (512, 6144), (1024, 3072)]
    base = None
    for ty, tx in combos:
        if h % ty or w % tx:
            continue
        ap.TILE_Y, ap.TILE_X = ty, tx
        ap._run.clear_cache()
        ov = (ty + 2 * ap.HALO_Y) * (tx + 2 * ap.HALO_X) / (ty * tx)
        try:
            t0 = time.time()
            out = ap._run(cfa, "RGGB", 65535.0, 65535.0 * 0.8)
            _fence(out)
            compile_s = time.time() - t0
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = ap._run(cfa, "RGGB", 65535.0, 65535.0 * 0.8)
            _fence(out)
            dt = (time.time() - t0) / n * 1000
            ref = "" if base is None else f"  ({dt - base:+.2f})"
            if base is None:
                base = dt
            print(f"TY={ty:5d} TX={tx:5d} halo x{ov:.3f}: {dt:8.2f} ms"
                  f"  compile {compile_s:.0f}s{ref}", flush=True)
        except Exception as e:
            print(f"TY={ty:5d} TX={tx:5d} halo x{ov:.3f}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
