"""Scope data computations (improccoordinator.cc:560-660 role)."""

import numpy as np

from art_tpu.pipeline.scopes import (histogram_rgbl, raw_histogram,
                                     vectorscope, waveform)


def test_histograms_count_all_pixels():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 65535, size=(3, 64, 96))
    h = histogram_rgbl(rgb)
    for k in ("r", "g", "b", "l"):
        assert h[k].sum() == 64 * 96
    # a bright image skews right
    bright = histogram_rgbl(np.full((3, 32, 32), 60000.0))
    assert bright["l"][-32:].sum() == 32 * 32


def test_waveform_shape_and_mass():
    rgb = np.random.default_rng(1).uniform(0, 65535, size=(3, 48, 1024))
    wf = waveform(rgb, bins=64, max_cols=256)
    assert wf.shape == (3, 64, 256)
    assert wf[0].sum() == 48 * 256


def test_vectorscope_neutral_centers():
    gray = np.full((3, 32, 32), 30000.0)
    vs = vectorscope(gray, size=64)
    assert vs.sum() == 32 * 32
    ij = np.unravel_index(vs.argmax(), vs.shape)
    assert abs(ij[0] - 31.5) < 2 and abs(ij[1] - 31.5) < 2


def test_raw_histogram_channels():
    from art_tpu.io.rawfile import synthesize_bayer

    rgb = np.full((3, 64, 64), 0.5)
    fr = synthesize_bayer(rgb, cam_mul=(2.0, 1.0, 1.5))
    h = raw_histogram(fr.cfa, fr.pattern, bins=64, white=16383)
    assert h["g"].sum() == 2 * h["r"].sum() == 2 * h["b"].sum()
    # R channel recorded darker (divided by its 2.0 gain)
    assert h["r"].argmax() < h["g"].argmax()
