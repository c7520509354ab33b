"""AMaZE Pallas tile-shape sweep on the real chip."""
from art_tpu.core import compilecache

compilecache.enable()

import time

import jax
import numpy as np


def fence(out):
    np.asarray(out[0, 0, :2])


def timeit(name, fn, *args, n=8):
    fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    print(f"{name:40s} {(time.time() - t0) / n * 1000:8.2f} ms")


def main():
    import art_tpu.demosaic.amaze_pallas as ap

    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    cfa = jax.device_put(
        rng.uniform(100.0, 60000.0, size=(h, w)).astype(np.float32))

    for ty in (256, 512):
        ap.TILE_Y = ty
        ap._run.clear_cache()
        fn = jax.jit(lambda c: ap.amaze_pallas(c, "RGGB", 65535.0,
                                               65535.0 * 0.8))
        try:
            timeit(f"amaze TILE_Y={ty}", fn, cfa)
        except Exception as e:
            print(f"amaze TILE_Y={ty} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
