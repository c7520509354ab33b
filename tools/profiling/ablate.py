"""Marginal per-feature cost of the bench config: time the FULL jitted
program with one feature removed at a time (the standalone-jit numbers
in phase_prof.py overstate fixed dispatch overhead and miss fusion)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()

import jax
import numpy as np


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)])


def time_config(frame, pp, n=8, batches=3):
    from art_tpu.core.image import pad_to_multiple
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings

    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    run = _executor(config)
    inp = jax.device_put(inp)
    data = jax.device_put(data)
    _fence(run(inp, data))
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(n):
            out = run(inp, data)
        _fence(out)
        best = min(best, (time.time() - t0) / n * 1000)
    return best


def main():
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams

    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    del rgb

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    arp = os.path.join(repo, "art_tpu", "data", "profiles",
                       "Standard Film Curve.arp")

    def make_pp():
        pp = ProcParams()
        pp.apply_arp_text(open(arp).read())
        pp.raw.bayer.method = "amaze"
        pp.denoise.enabled = True
        pp.denoise.luminance = 20.0
        pp.denoise.chrominance = 20.0
        return pp

    base = time_config(frame, make_pp())
    print(f"{'FULL':34s} {base:8.2f} ms", flush=True)

    variants = []
    pp = make_pp(); pp.raw.bayer.method = "bilinear"
    variants.append(("demosaic->bilinear", pp))
    pp = make_pp(); pp.denoise.enabled = False
    variants.append(("denoise off", pp))
    pp = make_pp(); pp.tone_curve.enabled = False
    variants.append(("tonecurve off", pp))
    pp = make_pp(); pp.exposure.hrmode = "Off"
    variants.append(("hl off", pp))
    pp = make_pp(); pp.raw.bayer.method = "none"
    variants.append(("demosaic->none", pp))
    pp = make_pp(); pp.denoise.enabled = False; pp.tone_curve.enabled = False
    variants.append(("denoise+tonecurve off", pp))

    for name, pp in variants:
        try:
            dt = time_config(frame, pp)
        except Exception as e:  # keep sweeping
            print(f"{name:34s} FAILED {type(e).__name__}", flush=True)
            continue
        print(f"{name:34s} {dt:8.2f} ms  (marginal {base - dt:+7.2f})",
              flush=True)


if __name__ == "__main__":
    main()
