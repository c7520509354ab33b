"""Tile-size sweep for the fused neutral-tonecurve Pallas kernel.

The kernel currently runs 256x128 tiles (grid 32x47 = 1504 programs at
the 24MP bench shape) — small tiles keep the live set in registers but
pay 1504 grid prologues. This sweeps (ty, tx) candidates in one chip
session by monkeypatching the tile pickers; results guide _pick_tx.
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

from art_tpu.ops import tonecurve_neutral as tcn


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)])


def main():
    h, w = 4096, 6016  # late-crop padded bench shape
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 65535.0, (3, h, w)).astype(np.float32))
    params = jnp.asarray(rng.uniform(0.1, 1.0, (52,)).astype(np.float32))
    coeffs = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 24)).astype(np.float32))

    cands = [(256, 128), (128, 256), (256, 256), (128, 512), (512, 128),
             (128, 128)]
    for ty, tx in cands:
        tcn._pick_tile = (lambda n, opts, _t=ty: _t if n % _t == 0 else None)
        tcn._pick_tx = (lambda w_, ty_, _t=tx: _t if w_ % _t == 0 else None)
        # fresh jit cache per variant (the jitted fn closes over pickers
        # at trace time; static args differ only via shapes, so clear)
        tcn._run_neutral_pallas.clear_cache()
        try:
            out = tcn._run_neutral_pallas(rgb, params, coeffs, (1, 24),
                                          epi=("srgb",))
            _fence(out)
            t0 = time.time()
            for _ in range(10):
                out = tcn._run_neutral_pallas(rgb, params, coeffs, (1, 24),
                                              epi=("srgb",))
            _fence(out)
            dt = (time.time() - t0) / 10 * 1000
            print(f"ty={ty:4d} tx={tx:4d}  {dt:8.2f} ms", flush=True)
        except Exception as e:
            print(f"ty={ty:4d} tx={tx:4d}  FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
