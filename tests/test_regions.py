"""Region-based ops: smoothing, texture boost, local contrast, grain."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def textured_frame(seed=2):
    rng = np.random.default_rng(seed)
    rgb = np.clip(0.4 + 0.15 * rng.standard_normal((3, 64, 64)), 0.05, 0.95)
    return synthesize_bayer(rgb)


def test_smoothing_guided_blurs():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[Smoothing]\nEnabled=true\nMode_1=0\nChannel_1=2\nRadius_1=5\n"
        "Epsilon_1=-6\nIterations_1=1\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() < base[:, 8:-8, 8:-8].std() * 0.8


def test_smoothing_gaussian_area_mask():
    frame = textured_frame()
    arp = ("[Smoothing]\nEnabled=true\nMode_1=1\nChannel_1=2\nSigma_1=6\n"
           "Iterations_1=1\nAreaMaskEnabled_1=true\n"
           "AreaMask0Type_1=rectangle\nAreaMask0X_1=-50\nAreaMask0Y_1=0\n"
           "AreaMask0Width_1=50\nAreaMask0Height_1=100\n")
    pp = ProcParams().apply_arp_text(arp)
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # left half smoothed, right half untouched
    left_o = out[:, 10:-10, 4:24].std()
    left_b = base[:, 10:-10, 4:24].std()
    right_o = out[:, 10:-10, 40:60].std()
    right_b = base[:, 10:-10, 40:60].std()
    assert left_o < left_b * 0.9
    assert abs(right_o - right_b) < 0.01


def test_texture_boost_amplifies_detail():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[TextureBoost]\nEnabled=true\nStrength_1=2.0\n"
        "DetailThreshold_1=0.2\nIterations_1=1\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std() * 1.05


def test_local_contrast_region():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[Local Contrast]\nEnabled=true\nContrast_1=50\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std()


def test_grain_adds_noise():
    rgb = np.full((3, 64, 64), 0.4)
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.grain.enabled = True
    pp.grain.strength = 80
    pp.grain.iso = 1600
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std() + 0.002
