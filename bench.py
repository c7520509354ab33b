"""Benchmark: 24MP raw -> sRGB full develop throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star >20 images/sec/chip on TPU v5e
(24MP, full AMaZE + denoise + tone pipeline). vs_baseline = value / 20.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from art_tpu.core import compilecache

    compilecache.enable()  # cold compile is ~5min on the axon tunnel

    import jax

    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings

    # 24MP Bayer frame (6000x4000), flagship pipeline profile
    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    del rgb

    import os

    pp = ProcParams()
    arp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "art_tpu", "data", "profiles",
                       "Standard Film Curve.arp")
    pp.apply_arp_text(open(arp).read())
    # north-star config: AMaZE + denoise + tone (BASELINE.md)
    pp.raw.bayer.method = "amaze"
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0

    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    run = _executor(config)

    inp_dev = jax.device_put(inp)
    data_dev = jax.device_put(data)

    # warmup (compile); fence with a host readback — block_until_ready
    # does not reliably fence on the axon tunnel
    out = run(inp_dev, data_dev)
    np.asarray(out[0, 0, :2])

    n = 10
    t0 = time.time()
    for _ in range(n):
        out = run(inp_dev, data_dev)
    np.asarray(out[0, 0, :2])
    dt = (time.time() - t0) / n

    value = 1.0 / dt
    print(json.dumps({
        "metric": "24MP raw->sRGB images/sec/chip (full develop pipeline)",
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
