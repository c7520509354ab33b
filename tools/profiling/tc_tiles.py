"""Sweep neutral-tonecurve Pallas tile sizes at the bench shape with the
fused sRGB epilogue (real chip, A/B interleaved, min over batches)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from art_tpu.ops import tonecurve_neutral as tn
    from art_tpu.params import ProcParams

    H, W = 4096, 6016
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 65535, (3, H, W)).astype(np.float32))
    lut = np.linspace(0, 1, 65536).astype(np.float32)
    _, data = tn.plan_neutral(ProcParams(), {"working_profile": "Rec2020"},
                              lut, 1.0)
    data = dict(data)
    data["out_mat"] = np.eye(3, dtype=np.float32)

    combos = [(128, 128), (256, 128), (256, 256), (512, 128), (128, 256),
              (512, 256), (256, 512)]
    runs = {}
    for ty, tx in combos:
        if H % ty or W % tx:
            print(f"ty={ty} tx={tx}: skip (not divisor)", flush=True)
            continue
        tn._pick_tile_orig = tn._pick_tile
        ty_, tx_ = ty, tx

        def mk(ty_=ty_, tx_=tx_):
            def runner():
                tn._pick_tile = lambda n, opts: (
                    ty_ if n == H else tx_)
                tn._pick_tx = lambda w, t: tx_
                return tn.apply_neutral(rgb, data, (("epi", ("srgb",)),))
            return runner
        runs[(ty, tx)] = [mk(), float("inf")]
        try:
            out = runs[(ty, tx)][0]()
            np.asarray(out[0, :2, :2])
        except Exception as e:
            print(f"ty={ty} tx={tx}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            del runs[(ty, tx)]
    for rnd in range(3):
        for key, slot in runs.items():
            t0 = time.time()
            for _ in range(5):
                out = slot[0]()
            np.asarray(out[0, :2, :2])
            slot[1] = min(slot[1], (time.time() - t0) * 200)
        print("round", rnd, "  ".join(
            f"{k}:{v[1]:6.2f}" for k, v in runs.items()), flush=True)


if __name__ == "__main__":
    main()
