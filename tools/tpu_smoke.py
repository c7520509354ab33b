"""TPU smoke gate: compile + run every Pallas kernel at bench shapes on
the REAL chip, then the full flagship program, asserting finite output
AND steady-state wall-clock budgets (the reference's WITH_BENCHMARK
StopWatch role, StopWatch.h:33-38 — made enforcing).

The pytest suite deliberately pins JAX_PLATFORMS=cpu (tests/conftest.py),
which flips every Pallas kernel to interpret mode — 336 green tests say
nothing about Mosaic compilation or VMEM budgets (the exact failure class
that shipped in round 2: a tile-size change put _run_neutral_pallas at
166M/128M VMEM and the driver bench crashed). This gate is the
compiled-path check: run it on the chip before every snapshot.

Usage:  python tools/tpu_smoke.py [--quick]
Exit 0 = all kernels compile, produce finite output at 24MP bench shapes
(4096x6016 padded domain), AND run within their per-kernel budgets
(BUDGET_MS, ~1.5x the round-4 measured steady state — a 2x perf
regression fails the gate, not just a crash). Results are appended to
SMOKE_TPU.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

H, W = 4096, 6016  # 24MP padded bench shape


def _finite(x, name):
    a = np.asarray(x)
    if not np.all(np.isfinite(a)):
        raise AssertionError(f"{name}: non-finite output")
    return a


# Steady-state wall-clock budgets (ms) at the 24MP bench shape.
# Method (r5 recalibration): budget = 1.5x the min-of-batches steady
# state measured by THIS harness (_exec_ms: min over 3 batches of 5,
# which rejects the shared chip's contention outliers the same way the
# check itself does). r4 shipped tonecurve_neutral RED at 15.16 vs a
# 15.0 budget derived from a different instrument (the in-pipeline
# ablation marginal ~6 ms, which XLA fusion makes incomparable to this
# standalone dispatch) — budgets below come from same-method r5
# measurements: tonecurve 13.4-14.0, amaze 23.7-26.7, wavelet
# (full-width tiles, r5) 23.8, nlmeans 74.7 (r4), flagship 46.0.
BUDGET_MS = {
    "tonecurve_neutral": 21.0,
    "amaze_pallas": 38.0,
    "wavelet_pallas": 36.0,
    "nlmeans_pallas": 110.0,
    "flagship": 69.0,
}


def _exec_ms(run, n=5, batches=3):
    """Steady-state ms/iteration of an already-compiled runner: min over
    `batches` timing batches (the shared chip + tunnel inflate single
    measurements by up to 2.5x; the min rejects contention outliers)."""
    out = run()
    np.asarray(out[(0,) * (out.ndim - 1) + (slice(0, 2),)])
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(n):
            out = run()
        np.asarray(out[(0,) * (out.ndim - 1) + (slice(0, 2),)])
        best = min(best, (time.time() - t0) * 1000.0 / n)
    return best


def check_tonecurve_neutral():
    import jax.numpy as jnp

    from art_tpu.ops import tonecurve_neutral as tn
    from art_tpu.params import ProcParams

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 65535, (3, H, W)).astype(np.float32))
    lut = np.linspace(0, 1, 65536).astype(np.float32)
    _, data = tn.plan_neutral(ProcParams(), {"working_profile": "Rec2020"},
                              lut, 1.0)
    data = dict(data)
    data["out_mat"] = np.eye(3, dtype=np.float32)
    out = tn.apply_neutral(rgb, data, (("epi", ("srgb",)),))
    _finite(out[:, ::512, ::512], "tonecurve_neutral(fused epilogue)")
    out = tn.apply_neutral(rgb, {k: data[k] for k in ("coeffs", "params")},
                           ())
    _finite(out[:, ::512, ::512], "tonecurve_neutral")
    return lambda: tn.apply_neutral(rgb, data, (("epi", ("srgb",)),))


def check_amaze():
    import jax.numpy as jnp

    from art_tpu.demosaic.amaze_pallas import amaze_pallas

    rng = np.random.default_rng(1)
    cfa = jnp.asarray(rng.uniform(0, 60000, (H, W)).astype(np.float32))
    out = amaze_pallas(cfa, "RGGB", 65535.0, 65535.0 * 0.8)
    assert out is not None, "amaze_pallas returned None at bench shape"
    _finite(out[:, ::512, ::512], "amaze_pallas")
    return lambda: amaze_pallas(cfa, "RGGB", 65535.0, 65535.0 * 0.8)


def check_wavelet():
    import jax.numpy as jnp

    from art_tpu.core.curve1d import fit_gamma_split
    from art_tpu.ops.wavelet_pallas import (wavelet_denoise_pallas_multi,
                                            wavelet_denoise_pallas_rgb)

    rng = np.random.default_rng(2)
    x3 = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    out = wavelet_denoise_pallas_multi(x3, [0.02, 0.02, 0.02],
                                       [1.0, 1.0, 1.0], [0.0, 0.0, 0.0])
    assert out is not None
    _finite(out[:, ::512, ::512], "wavelet_pallas_multi")
    gf, gi = fit_gamma_split(1.7)
    import jax
    x65 = jax.block_until_ready(x3 * 65535.0)
    out = wavelet_denoise_pallas_rgb(
        x65, (0.3, 0.6, 0.1), 1.0, gf, gi,
        [-1.0, 0.02, 0.02], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0])
    assert out is not None
    _finite(out[:, ::512, ::512], "wavelet_pallas_rgb(fused, MAD)")
    return lambda: wavelet_denoise_pallas_rgb(
        x65, (0.3, 0.6, 0.1), 1.0, gf, gi,
        [-1.0, 0.02, 0.02], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0])


def check_nlmeans():
    import jax.numpy as jnp

    from art_tpu.ops.nlmeans_pallas import nlmeans_pallas

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.uniform(0, 65535, (H, W)).astype(np.float32))
    import jax
    ones = jax.block_until_ready(jnp.ones_like(y))
    out = nlmeans_pallas(y, ones)
    assert out is not None
    _finite(out[::512, ::512], "nlmeans_pallas")
    return lambda: nlmeans_pallas(y, ones)


def check_flagship():
    """The full bench pipeline (plan + jit executor) for one frame."""
    import jax

    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _executor, plan
    from art_tpu.settings import settings

    rng = np.random.default_rng(4)
    rgb = rng.uniform(0.02, 0.95, size=(3, 4000, 6000)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    pp = ProcParams()
    arp = os.path.join(ROOT, "art_tpu", "data", "profiles",
                       "Standard Film Curve.arp")
    pp.apply_arp_text(open(arp).read())
    pp.raw.bayer.method = "amaze"
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0
    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    run = _executor(config)
    inp = jax.device_put(inp)
    data = jax.device_put(data)
    out = run(inp, data)
    _finite(np.asarray(out[:, ::512, ::512]), "flagship pipeline")
    return lambda: run(inp, data)


CHECKS = [
    ("tonecurve_neutral", check_tonecurve_neutral),
    ("amaze_pallas", check_amaze),
    ("wavelet_pallas", check_wavelet),
    ("nlmeans_pallas", check_nlmeans),
    ("flagship", check_flagship),
]


def main():
    quick = "--quick" in sys.argv
    import jax

    from art_tpu.core import compilecache

    compilecache.enable()
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"tpu_smoke: backend is {backend!r}, not a TPU — this gate "
              "only means something compiled on the chip. FAIL.")
        sys.exit(2)

    results = {}
    rc = 0
    for name, fn in CHECKS:
        if quick and name == "flagship":
            continue
        t0 = time.time()
        try:
            run = fn()
            dt = time.time() - t0
            ms = _exec_ms(run) if run is not None else None
            budget = BUDGET_MS.get(name)
            ok = ms is None or budget is None or ms <= budget
            tag = "OK  " if ok else "SLOW"
            print(f"  {name:24s} {tag} ({dt:6.1f}s compile, "
                  f"{ms if ms is None else round(ms, 1)} ms/run, "
                  f"budget {budget})")
            results[name] = {"ok": ok, "seconds": round(dt, 1),
                             "exec_ms": None if ms is None else round(ms, 2),
                             "budget_ms": budget}
            if not ok:
                rc = 1
        except Exception as e:
            dt = time.time() - t0
            msg = str(e).splitlines()[0][:200]
            print(f"  {name:24s} FAIL ({dt:6.1f}s): {msg}")
            results[name] = {"ok": False, "seconds": round(dt, 1),
                             "error": msg}
            rc = 1
    out = {"when": time.strftime("%Y-%m-%d %H:%M:%S"),
           "backend": backend, "ok": rc == 0, "results": results}
    with open(os.path.join(ROOT, "SMOKE_TPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"tpu_smoke: {'PASS' if rc == 0 else 'FAIL'}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
