"""Sweep wavelet-RGB Pallas tile sizes at the bench shape (real chip).

Halo overhead per (TY, TX): (TY+128)(TX+128) / (TY*TX) with PAD=64.
Row halo dominates at TY=256 (1.5x); this measures larger tiles against
their Mosaic compile cost (r3 note: TY=512 compiled >25min — rechecked
here under the persistent cache).
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
    from art_tpu.core.curve1d import fit_gamma_split
    from art_tpu.ops import wavelet_pallas as wp

    h, w = 4096, 6016  # true padded bench shape
    rng = np.random.default_rng(2)
    x65 = jnp.asarray(
        rng.uniform(0, 65535, (3, h, w)).astype(np.float32))
    gf, gi = fit_gamma_split(1.7)

    def run():
        return wp.wavelet_denoise_pallas_rgb(
            x65, (0.3, 0.6, 0.1), 1.0, gf, gi,
            [-1.0, 0.02, 0.02], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0])

    combos = [(256, 1024), (256, 3072), (256, 2048), (512, 1024),
              (512, 3072)]
    for ty, tx in combos:
        wp.TILE_Y, wp.TILE_X = ty, tx
        wp._run_rgb.clear_cache()
        eh = h + (-h) % ty
        ew = w + (-w) % tx
        ov = ((ty + 128) * (tx + 128) * eh * ew) / (ty * tx * h * w)
        try:
            t0 = time.time()
            _fence(run())
            compile_s = time.time() - t0
            n = 10
            t0 = time.time()
            for _ in range(n):
                out = run()
            _fence(out)
            dt = (time.time() - t0) / n * 1000
            print(f"TY={ty:4d} TX={tx:5d} eff x{ov:.3f}: {dt:8.2f} ms"
                  f"  compile {compile_s:.0f}s", flush=True)
        except Exception as e:
            print(f"TY={ty:4d} TX={tx:5d} eff x{ov:.3f}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
