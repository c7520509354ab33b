"""Benchmark: 24MP raw -> sRGB full develop throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json north star >20 images/sec/chip on TPU v5e
(24MP, full AMaZE + denoise + tone pipeline). vs_baseline = value / 20.

Methodology: the value is the best (min-time) of 3 timing batches of 10
iterations each, fenced by a host readback. The bench chip is shared and
reached through a network tunnel; single-batch means are inflated by up
to 2.5x by neighbor contention (documented in tools/tpu_smoke.py), while
the min-of-batches converges on the machine's steady-state throughput —
the quantity the metric is defined over.

The primary value runs the production batch-queue device step: each
dispatch develops `settings.device_batch` (= 4) images through an
in-program lax.map chain (`develop._executor_batched`, the same program
`parallel/queue.py` dispatches per device). This amortizes the fixed
per-execute dispatch cost (~2.2ms on the axon tunnel — measured by
tools/profiling/microbw.py noop floor) across the batch;
`single_dispatch` reports the one-image-per-execute figure.
`secondary_textured` runs the same compiled program on a synthetic
textured scene (gradients + edges + mild noise) — real photographs are
not uniform random noise, and data-dependent kernels (AMaZE Nyquist
handling) see the difference.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _textured_scene(h, w):
    """Synthetic photographic scene: smooth gradients, hard edges,
    fine texture bands, mild sensor noise."""
    rng = np.random.default_rng(7)
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    base = 0.25 + 0.5 * (0.6 * x + 0.4 * y)
    edges = 0.15 * ((np.floor(x * 8) % 2) == 0).astype(np.float32)
    texture = 0.05 * np.sin(x * 900)[None, :].reshape(1, w) * \
        np.sin(y * 700).reshape(h, 1)
    r = np.clip(base + edges + texture, 0.02, 0.95)
    g = np.clip(base * 1.05 + texture, 0.02, 0.95)
    b = np.clip(base * 0.9 + edges, 0.02, 0.95)
    rgb = np.stack([r, g, b]).astype(np.float32)
    rgb += rng.normal(0, 0.004, size=rgb.shape).astype(np.float32)
    return np.clip(rgb, 0.01, 0.99)


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

    from art_tpu.pipeline.develop import _executor_batched

    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    run = _executor(config)
    B = max(1, settings.device_batch)
    run_b = _executor_batched(config, B)

    data_dev = jax.device_put(data)
    data_b = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.stack([np.asarray(x)] * B),
                               data))

    def measure(cfa, n=10, batches=3):
        inp_dev = jax.device_put(cfa)
        # warmup (compile); fence with a host readback — block_until_ready
        # does not reliably fence on the axon tunnel
        out = run(inp_dev, data_dev)
        np.asarray(out[0, 0, :2])
        best = float("inf")
        for _ in range(batches):
            t0 = time.time()
            for _ in range(n):
                out = run(inp_dev, data_dev)
            np.asarray(out[0, 0, :2])
            best = min(best, (time.time() - t0) / n)
        return 1.0 / best

    def measure_batched(cfa, n=4, batches=3):
        inp_dev = jax.device_put(
            np.broadcast_to(cfa, (B,) + cfa.shape).copy())
        out = run_b(inp_dev, data_b)
        np.asarray(out[0, 0, 0, :2])
        best = float("inf")
        for _ in range(batches):
            t0 = time.time()
            for _ in range(n):
                out = run_b(inp_dev, data_b)
            np.asarray(out[0, 0, 0, :2])
            best = min(best, (time.time() - t0) / (n * B))
        return 1.0 / best

    value_single = measure(inp)
    value = measure_batched(inp)

    frame_t = synthesize_bayer(_textured_scene(h, w), pattern="RGGB")
    inp_t, _ = pad_to_multiple(frame_t.cfa, settings.pad_multiple)
    value_t = measure_batched(inp_t)

    print(json.dumps({
        "metric": "24MP raw->sRGB images/sec/chip (full develop pipeline)",
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 20.0, 3),
        "secondary_textured": round(value_t, 3),
        "single_dispatch": round(value_single, 3),
        "device_batch": B,
    }))


if __name__ == "__main__":
    main()
