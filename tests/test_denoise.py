"""Denoise tests: wavelet NR + NLMeans reduce noise, preserve structure."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def noisy_frame(sigma=400.0, seed=11):
    rng = np.random.default_rng(seed)
    rgb = np.full((3, 96, 96), 0.35)
    rgb[:, :, 48:] = 0.65  # an edge to preserve
    frame = synthesize_bayer(rgb, black=512, white=16383)
    frame.cfa = np.clip(
        frame.cfa + rng.normal(0, sigma, frame.cfa.shape), 0, 16383
    ).astype(np.float32)
    return frame


def flat_std(img):
    return img[:, 16:40, 8:40].std()


def test_wavelet_denoise_reduces_noise():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 60
    pp.denoise.chrominance = 30
    pp.denoise.chrominance_method = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert flat_std(out) < flat_std(base) * 0.7
    # edge preserved: means on both sides stay distinct
    assert out[:, 16:80, 60:90].mean() - out[:, 16:80, 8:40].mean() > 0.15


def test_nlmeans_reduces_noise_further():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 0
    pp.denoise.chrominance_method = 0
    pp.denoise.chrominance = 0
    pp.denoise.smoothing_enabled = True
    pp.denoise.smoothing_method = 0
    pp.denoise.nl_strength = 80
    pp.denoise.nl_detail = 50
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert flat_std(out) < flat_std(base)
    assert np.all(np.isfinite(out))


def test_denoise_identity_when_zero():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 0
    pp.denoise.chrominance = 0
    pp.denoise.chrominance_method = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    np.testing.assert_allclose(out, base, atol=0.02)
