"""Auto adjustments: auto WB, auto log, histogram matching curve."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop
from art_tpu.pipeline.autos import (auto_wb_multipliers,
                                    histogram_matching_curve)


def test_auto_wb_neutralizes_gray_scene():
    gray = np.broadcast_to(np.full(3, 0.4)[:, None, None], (3, 64, 64)).copy()
    # synthesize with a WRONG camera WB so as-shot looks wrong
    frame = synthesize_bayer(gray, cam_mul=(1.0, 1.0, 1.0))
    frame.cam_mul = np.array([2.0, 1.0, 1.5, 1.0])  # lie about as-shot
    pp = ProcParams()
    pp.wb.method = "Auto"
    out = develop(frame, pp)
    c = out[:, 16:-16, 16:-16].mean(axis=(1, 2))
    assert np.ptp(c) < 0.02  # gray restored


def test_auto_log_reasonable_range():
    rng = np.random.default_rng(5)
    rgb = rng.uniform(0.02, 0.9, (3, 128, 128))
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.logenc.enabled = True
    pp.logenc.auto_gain = True
    out = develop(frame, pp)
    assert np.all(np.isfinite(out))
    assert pp.logenc.auto_gain is False  # autos resolved
    assert -16 < pp.logenc.black_ev < 0
    assert 0 < pp.logenc.white_ev < 17


def test_histogram_matching_curve_monotone():
    rng = np.random.default_rng(6)
    src = rng.uniform(0, 1, (3, 64, 64))
    tgt = np.clip(src ** 0.7, 0, 1)  # brighter look
    pts = histogram_matching_curve(src, tgt)
    xs = pts[1::2]
    ys = pts[2::2]
    assert all(b >= a for a, b in zip(xs, xs[1:]))
    # target brighter => curve above identity in midtones
    mid = len(xs) // 2
    assert ys[mid] > xs[mid]


def test_deconv_auto_radius_tracks_blur():
    """getDeconvAutoRadius (deconvautoradius.cc): the estimate grows
    monotonically with capture blur."""
    import cv2

    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.pipeline.autos import deconv_auto_radius

    rng = np.random.default_rng(0)
    base = cv2.resize(rng.uniform(0.1, 0.9, (16, 16)), (256, 256),
                      interpolation=cv2.INTER_NEAREST)
    ests = []
    for sigma in (0.6, 1.3):
        blurred = cv2.GaussianBlur(base, (0, 0), sigma)
        fr = synthesize_bayer(np.stack([blurred] * 3), cam_mul=(1, 1, 1))
        ests.append(deconv_auto_radius(fr))
    assert ests[0] is not None and ests[1] is not None
    assert ests[1] > ests[0]
