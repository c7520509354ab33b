"""Fused denoise kernel: in-kernel MAD cost vs fixed sigma; tonecurve."""
from art_tpu.core import compilecache

compilecache.enable()

import time

import jax
import numpy as np


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[0, 0, :2])


def timeit(name, fn, *args, n=8):
    fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    print(f"{name:44s} {(time.time() - t0) / n * 1000:8.2f} ms", flush=True)


def main():
    import jax.numpy as jnp

    from art_tpu.color import colorspaces as cs
    from art_tpu.core.curve1d import fit_gamma_split
    from art_tpu.ops.wavelet_pallas import wavelet_denoise_pallas_rgb

    h, w = 4096, 6144
    rng = np.random.default_rng(0)
    rgb = jax.device_put(rng.uniform(
        100.0, 60000.0, size=(3, h, w)).astype(np.float32))
    lw = cs.MATRICES_RGB_TO_XYZ["Rec2020"][1].astype(np.float32)
    gf, gi = fit_gamma_split(1.7)
    strengths = [5.1, 3.2, 3.2]
    blends = [0.3, 0.0, 0.0]

    def run_mad(x):
        return wavelet_denoise_pallas_rgb(x, lw, np.float32(1.0), gf, gi,
                                          [-1.0, -1.0, -1.0], strengths,
                                          blends)

    def run_fixed(x):
        return wavelet_denoise_pallas_rgb(x, lw, np.float32(1.0), gf, gi,
                                          [120.0, 80.0, 80.0], strengths,
                                          blends)

    timeit("fused denoise, in-kernel MAD", jax.jit(run_mad), rgb)
    timeit("fused denoise, fixed sigma", jax.jit(run_fixed), rgb)


if __name__ == "__main__":
    main()
