"""Cross-backend consistency check: the flagship develop on the real
TPU vs the pure-CPU path (Pallas kernels in interpret mode).

The reference binary cannot be built in this environment (BASELINE.md),
so ΔE-vs-ART is not measurable; this artifact instead proves the
compiled TPU kernels (AMaZE stages, wavelet denoise, neutral tone
curve) agree with the portable implementation the test suite pins.

Run (two processes; backend is process-global):
  python tools/backend_diff.py tpu /tmp/bd_tpu.npy
  JAX_PLATFORMS=cpu python tools/backend_diff.py cpu /tmp/bd_cpu.npy
  python tools/backend_diff.py report /tmp/bd_tpu.npy /tmp/bd_cpu.npy

Writes BACKEND_DIFF.json at the repo root in report mode.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 512, 2048  # >= one AMaZE Pallas tile so the TPU kernel path runs


def render(out_path, backend=None):
    if backend == "cpu":
        # the axon plugin wins over JAX_PLATFORMS in some import
        # orders; force via config (same trick as tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from art_tpu.core import compilecache

    compilecache.enable()

    import art_tpu
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop

    art_tpu.init()
    rng = np.random.default_rng(42)
    y = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    x = np.linspace(0, 1, W, dtype=np.float32)[None, :]
    base = 0.2 + 0.5 * (0.5 * x + 0.5 * y)
    tex = 0.08 * np.sin(x * 300) * np.cos(y * 200)
    rgb = np.stack([
        np.clip(base + tex, 0.02, 0.95),
        np.clip(base * 1.1, 0.02, 0.95),
        np.clip(base * 0.9 - tex, 0.02, 0.95),
    ]).astype(np.float32)
    rgb += rng.normal(0, 0.003, rgb.shape).astype(np.float32)
    frame = synthesize_bayer(np.clip(rgb, 0.01, 0.99), pattern="RGGB")

    pp = ProcParams()
    arp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "art_tpu", "data", "profiles",
        "Standard Film Curve.arp")
    pp.apply_arp_text(open(arp).read())
    pp.raw.bayer.method = "amaze"
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0
    out = np.asarray(develop(frame, pp))
    np.save(out_path, out)
    import jax

    print(f"backend={jax.default_backend()} -> {out_path} "
          f"shape={out.shape}")


def report(tpu_path, cpu_path):
    a = np.load(tpu_path).astype(np.float64)
    b = np.load(cpu_path).astype(np.float64)
    assert a.shape == b.shape
    d = np.abs(a - b)
    res = {
        "shape": list(a.shape),
        "max_abs_diff_01": float(d.max()),
        "mean_abs_diff_01": float(d.mean()),
        "max_diff_8bit_lsb": float(d.max() * 255.0),
        "p999_diff_8bit_lsb": float(np.quantile(d, 0.999) * 255.0),
        "pct_pixels_within_1_lsb8": float(
            (d.max(axis=0) <= 1.0 / 255.0).mean() * 100.0),
        "note": "flagship develop (AMaZE+denoise+neutral curve) on the "
                "real TPU vs the pure-CPU interpret path; outputs in "
                "[0,1]",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BACKEND_DIFF.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "report":
        report(sys.argv[2], sys.argv[3])
    else:
        render(sys.argv[2], backend=mode)
