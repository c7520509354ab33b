"""End-to-end develop pipeline tests against the synthetic oracle.

The oracle: `synthesize_bayer` mosaics a known linear-sRGB image with an
identity camera; the develop chain with neutral params must reconstruct
srgb_gamma(original) up to demosaic error (SURVEY §4 test strategy).
"""

import numpy as np
import pytest

from art_tpu.color import colorspaces as cs
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def make_gradient_rgb(h=64, w=96):
    y = np.linspace(0.05, 0.9, h)[None, :, None]
    x = np.linspace(0.1, 0.8, w)[None, None, :]
    r = np.broadcast_to(y * x, (1, h, w))
    g = np.broadcast_to(0.2 + 0.5 * x, (1, h, w))
    b = np.broadcast_to(0.7 - 0.4 * y, (1, h, w))
    return np.concatenate([r, g, b], axis=0)


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_flat_field_reconstruction(pattern):
    """A constant color must reconstruct exactly (no demosaic error)."""
    color = np.array([0.4, 0.3, 0.6])
    rgb = np.broadcast_to(color[:, None, None], (3, 32, 48)).copy()
    frame = synthesize_bayer(rgb, pattern=pattern)
    pp = ProcParams()
    out = develop(frame, pp)
    assert out.shape == (3, 32, 48)
    expected = cs.srgb_gamma(color)
    got = out[:, 8:-8, 8:-8].mean(axis=(1, 2))
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_gradient_reconstruction_bilinear():
    rgb = make_gradient_rgb()
    frame = synthesize_bayer(rgb, pattern="RGGB")
    pp = ProcParams()
    pp.raw.bayer.method = "fast"  # bilinear
    out = develop(frame, pp)
    expected = cs.srgb_gamma(rgb)
    err = np.abs(out[:, 4:-4, 4:-4] - expected[:, 4:-4, 4:-4])
    assert err.mean() < 0.01
    assert err.max() < 0.06


def test_exposure_compensation():
    color = np.array([0.2, 0.2, 0.2])
    rgb = np.broadcast_to(color[:, None, None], (3, 32, 32)).copy()
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.exposure.expcomp = 1.0  # +1 EV
    out = develop(frame, pp)
    expected = cs.srgb_gamma(color * 2.0)
    got = out[:, 8:-8, 8:-8].mean(axis=(1, 2))
    np.testing.assert_allclose(got, expected, atol=3e-3)


def test_custom_wb_multipliers_neutralize_cast():
    """Developing with the same WB the mosaic was synthesized with must
    produce a neutral gray; a different WB must shift it."""
    gray = np.broadcast_to(np.full(3, 0.4)[:, None, None], (3, 32, 32)).copy()
    frame = synthesize_bayer(gray, cam_mul=(2.0, 1.0, 1.4))
    pp = ProcParams()
    out_cam = develop(frame, pp)
    got = out_cam[:, 8:-8, 8:-8].mean(axis=(1, 2))
    np.testing.assert_allclose(got, cs.srgb_gamma(np.full(3, 0.4)), atol=2e-3)


def test_tone_curve_standard():
    color = np.array([0.25, 0.25, 0.25])
    rgb = np.broadcast_to(color[:, None, None], (3, 32, 32)).copy()
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.tone_curve.enabled = True
    pp.tone_curve.curve_mode = "Standard"
    pp.tone_curve.curve_mode2 = "Standard"
    # brightening spline in sRGB-encoded domain
    pp.tone_curve.curve = [1, 0, 0, 0.5, 0.7, 1, 1]
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].mean() > base[:, 8:-8, 8:-8].mean() + 0.05


def test_neutral_tone_curve_runs():
    """Default ART look (Neutral mode) with the Standard Film Curve."""
    rgb = make_gradient_rgb(32, 48)
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.apply_arp_text(
        open("/root/reference/rtdata/profiles/Standard Film Curve.arp").read())
    assert pp.tone_curve.curve_mode == "Neutral"
    out = develop(frame, pp)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the film curve must darken shadows relative to linear
    base = develop(frame, ProcParams())
    dark = rgb.min(axis=0) < 0.15


def test_saturation_op():
    color = np.array([0.5, 0.3, 0.3])
    rgb = np.broadcast_to(color[:, None, None], (3, 32, 32)).copy()
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.saturation.enabled = True
    pp.saturation.saturation = 50
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # saturation raises R relative to G/B for a reddish patch
    c = out[:, 8:-8, 8:-8].mean(axis=(1, 2))
    c0 = base[:, 8:-8, 8:-8].mean(axis=(1, 2))
    assert (c[0] - c[1]) > (c0[0] - c0[1])


def test_develop_pixelshift_wiring():
    """plan/develop must route 4-frame pixel-shift files through the
    combine (simpleprocess stage_init + rawimagesource.cc:1888)."""
    from art_tpu.io.rawfile import synthesize_pixelshift
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop, plan

    rng = np.random.default_rng(2)
    rgb = rng.uniform(0.1, 0.8, size=(3, 64, 96)).astype(np.float32)
    fr = synthesize_pixelshift(rgb, cam_mul=(1.0, 1.0, 1.0))
    pp = ProcParams()
    pp.raw.bayer.method = "pixelshift"
    config, _ = plan(fr, pp)
    assert config.pixelshift
    out = develop(fr, pp)
    assert out.shape[1:] == (64, 96)
    assert np.isfinite(out).all()

    # without extra frames: fall back to amaze
    fr2 = synthesize_pixelshift(rgb, cam_mul=(1.0, 1.0, 1.0))
    fr2.extra_frames = None
    config2, _ = plan(fr2, pp)
    assert not config2.pixelshift
    assert config2.demosaic_method == "amaze"


def test_progress_listener_milestones(tmp_path):
    """ProgressListener surface (rtengine.h:150-166): monotonic phase
    milestones fire through process_image, error() on load failure."""
    import numpy as np

    from art_tpu.io.dngwrite import write_dng
    from art_tpu.pipeline.develop import process_image
    from art_tpu.pipeline.listeners import CallbackListener
    from art_tpu.params import ProcParams

    m = np.random.default_rng(0).integers(
        100, 15000, size=(32, 48)).astype(np.uint16)
    p = tmp_path / "l.dng"
    write_dng(p, m)
    seen = []
    msgs = []
    lst = CallbackListener(on_progress=seen.append,
                           on_message=msgs.append)
    process_image(str(p), ProcParams(), output_path=str(tmp_path / "l.jpg"),
                  listener=lst)
    assert seen == sorted(seen) and seen[-1] == 1.0
    assert "decode" in msgs and "save" in msgs

    errs = []
    bad = tmp_path / "missing.dng"
    try:
        process_image(str(bad), ProcParams(),
                      listener=CallbackListener(on_error=errs.append))
    except Exception:
        pass
    assert errs and "load failed" in errs[0]


def test_pipeline_listener_autos(tmp_path):
    """PipelineListener receives auto-WB, image type, and histogram
    callbacks (reference rtengine.h:272-418 listener surface)."""
    import numpy as np

    from art_tpu.io.dngwrite import write_dng
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image
    from art_tpu.pipeline.listeners import PipelineListener

    m = (np.random.default_rng(0).uniform(0.1, 0.8, (64, 96)) * 16000
         + 500).astype(np.uint16)
    p = tmp_path / "l.dng"
    write_dng(p, m, black=500, white=16500)

    got = {}

    class L(PipelineListener):
        def image_type_changed(self, is_raw, is_bayer, is_xtrans, is_mono):
            got["type"] = (is_raw, is_bayer, is_xtrans, is_mono)

        def auto_wb_changed(self, temp, green):
            got["wb"] = (temp, green)

        def histogram_changed(self, h):
            got["hist"] = h

        def set_progress(self, pct):
            got.setdefault("pcts", []).append(pct)

    pp = ProcParams()
    pp.wb.enabled = True
    pp.wb.method = "Auto"
    out = tmp_path / "l.jpg"
    process_image(str(p), pp, output_path=str(out), listener=L())
    assert got["type"] == (True, True, False, False)
    assert 1500 <= got["wb"][0] <= 60000 and got["wb"][1] > 0
    assert set(got["hist"]) == {"r", "g", "b", "l"}
    assert sum(got["hist"]["l"]) == 64 * 96
    assert got["pcts"][-1] == 1.0
