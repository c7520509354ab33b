"""End-to-end ΔE2000 golden regression (BASELINE.md north star: the
reference binary cannot run here, so the quality gate is a pinned
golden render — any pipeline change that shifts colors beyond ΔE
tolerances fails, making color drift visible and reviewable.

The golden is regenerated with
``python tests/test_golden_deltae.py --regen`` and committed; the test
compares in Lab with the CIEDE2000 metric (color/colorspaces.py:297),
the same metric BASELINE.json uses for reference parity (max ΔE < 1.0).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_develop.npz")


def _synthetic_scene():
    """Deterministic raw scene: color patches + gradient + edges +
    shot-noise texture, exercising demosaic/denoise/curves."""
    rng = np.random.default_rng(2024)
    h, w = 96, 128
    rgb = np.zeros((3, h, w), np.float32)
    patches = [(0.8, 0.1, 0.1), (0.1, 0.8, 0.1), (0.1, 0.1, 0.8),
               (0.7, 0.7, 0.1), (0.6, 0.3, 0.1), (0.4, 0.4, 0.4),
               (0.9, 0.9, 0.9), (0.05, 0.05, 0.05)]
    pw = w // len(patches)
    for i, p in enumerate(patches):
        for c in range(3):
            rgb[c, : h // 2, i * pw : (i + 1) * pw] = p[c]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    grad = xx / w * 0.8 + 0.05
    rgb[:, h // 2 :, :] = grad[None, h // 2 :, :]
    rgb[0, 3 * h // 4 :, :: 8] = 0.9  # edges
    rgb += rng.normal(0.0, 0.01, rgb.shape).astype(np.float32)
    return np.clip(rgb, 0.0, 1.0)


def _develop():
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    frame = synthesize_bayer(_synthetic_scene())
    pp = ProcParams()
    pp.raw.bayer.method = "rcd"
    pp.denoise.enabled = True
    pp.denoise.luminance = 10.0
    pp.denoise.chrominance = 10.0
    pp.tone_curve.enabled = True
    pp.tone_curve.contrast = 20
    pp.saturation.enabled = True
    pp.saturation.saturation = 15
    pp.sharpening.enabled = True
    out = np.asarray(process_image(frame, pp), np.float32)
    return np.clip(out, 0.0, 1.0)


def _to_lab(srgb):
    """(3, H, W) sRGB-encoded [0,1] -> (3, H*W) Lab rows."""
    from art_tpu.color import colorspaces as cs

    lin = np.asarray(cs.srgb_igamma(srgb.astype(np.float64), np))
    xyz = np.tensordot(cs.MATRICES_RGB_TO_XYZ["sRGB"], lin, axes=1)
    L, a, b = cs.xyz_to_lab(xyz[0], xyz[1], xyz[2], np)
    return np.stack([L.ravel(), a.ravel(), b.ravel()])


def test_golden_deltae2000():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden missing — run tests/test_golden_deltae.py "
                    "--regen to create it")
    from art_tpu.color.colorspaces import delta_e2000

    out = _develop()
    ref = np.load(GOLDEN)["rgb"].astype(np.float32)
    assert out.shape == ref.shape
    de = delta_e2000(_to_lab(out), _to_lab(ref))
    # BASELINE.json: parity target max dE < 1.0; golden drift allows a
    # small cross-platform numeric margin on top of exact equality
    assert float(np.mean(de)) < 0.1, float(np.mean(de))
    assert float(np.percentile(de, 99.9)) < 1.0, \
        (float(np.percentile(de, 99.9)), float(de.max()))


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        rgb = _develop()
        np.savez_compressed(GOLDEN, rgb=rgb.astype(np.float16))
        print(f"wrote {GOLDEN} ({os.path.getsize(GOLDEN)} bytes)")
