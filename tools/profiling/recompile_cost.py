"""Measure the per-resolution recompile cost for a mixed-camera catalog
(BASELINE config 5 concern; VERDICT r3 item 9).

Times plan+compile of the flagship config at several sensor resolutions
that pad to distinct padded shapes, twice each (cold = first compile or
persistent-cache hit; warm = in-process executor cache). Emits one JSON
line for STATUS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    from art_tpu.core import compilecache
    compilecache.enable()
    import jax

    import art_tpu
    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings

    art_tpu.init()
    # distinct padded buckets at pad_multiple=128
    resolutions = [(4000, 6000), (3648, 5472), (4160, 6240), (3000, 4000)]
    out = {"pad_multiple": settings.pad_multiple, "resolutions": []}
    pp = ProcParams()
    pp.raw.bayer.method = "amaze"
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    for h, w in resolutions:
        rng = np.random.default_rng(h)
        frame = synthesize_bayer(
            rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32))
        config, data = plan(frame, pp)
        inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
        inp = jax.device_put(inp)
        data = jax.device_put(data)
        t0 = time.time()
        run = _executor(config)
        np.asarray(run(inp, data)[..., :2])
        cold = time.time() - t0
        t0 = time.time()
        np.asarray(run(inp, data)[..., :2])
        warm = time.time() - t0
        out["resolutions"].append(
            {"sensor": [h, w], "padded": list(config.shape),
             "first_run_s": round(cold, 2), "steady_s": round(warm, 3)})
        print(json.dumps(out["resolutions"][-1]), flush=True)
    print(json.dumps(out))
    if "--out" in sys.argv:
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
