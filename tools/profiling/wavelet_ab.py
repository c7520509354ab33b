"""A/B/A wavelet-RGB tile comparison: alternate configs to cancel the
shared-chip contention drift; report per-config min-of-batches."""
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

    h, w = 4096, 6016
    rng = np.random.default_rng(2)
    x65 = jnp.asarray(
        rng.uniform(0, 65535, (3, h, w)).astype(np.float32))
    gf, gi = fit_gamma_split(1.7)

    def run(tx):
        wp.TILE_X = tx
        return wp.wavelet_denoise_pallas_rgb(
            x65, (0.3, 0.6, 0.1), 1.0, gf, gi,
            [-1.0, 0.02, 0.02], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0])

    txs = [1024, 3072, 6016]
    best = {}
    for tx in txs:
        try:
            _fence(run(tx))
            best[tx] = float("inf")
        except Exception as e:
            print(f"TX={tx}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    for rnd in range(4):
        for tx in list(best):
            t0 = time.time()
            for _ in range(5):
                out = run(tx)
            _fence(out)
            best[tx] = min(best[tx], (time.time() - t0) * 200)
        print(f"round {rnd}: " + "  ".join(
            f"TX={tx}:{best[tx]:7.2f}ms" for tx in best), flush=True)


if __name__ == "__main__":
    main()
