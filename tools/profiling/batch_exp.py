"""Does batching images per execute amortize the tunnel's ~2.2ms
serial dispatch? Times the flagship program at batch 1/2/4 via vmap."""
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
    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _build_run, plan
    from art_tpu.settings import settings

    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    del rgb
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    pp = ProcParams()
    pp.apply_arp_text(open(os.path.join(
        repo, "art_tpu/data/profiles/Standard Film Curve.arp")).read())
    pp.raw.bayer.method = "amaze"
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0
    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    inp = inp.astype(np.uint16)
    run = _build_run(config)

    for b in (1, 2, 4):
        binp = jax.device_put(np.broadcast_to(inp, (b,) + inp.shape).copy())
        bdata = jax.device_put(data)
        if b > 1:
            # vmap cannot batch ANY-memspace pallas buffers; a lax.map
            # body compiles once and the executes chain in-program
            f = jax.jit(lambda xs, d: jax.lax.map(lambda x: run(x, d), xs))
        else:
            f = jax.jit(run)
        arg = binp if b > 1 else jax.device_put(inp)
        t0 = time.time()
        out = f(arg, bdata)
        _fence(out)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(6):
                out = f(arg, bdata)
            _fence(out)
            best = min(best, (time.time() - t0) / 6)
        print(f"batch {b}: {best*1000:.2f} ms/exec = "
              f"{best*1000/b:.2f} ms/img (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
