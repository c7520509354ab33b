"""Native CR2 decode path: sliced lossless-JPEG, MakerNote WB, masked
black, active-area crop (oracle: tests/util_cr2.py synthetic writer)."""

import numpy as np
import pytest

from art_tpu.io.rawfile import load_raw, synthesize_bayer
from tests.util_cr2 import write_cr2


def _make_sensor(h=120, w=160, border=(4, 8), black=256.0, rng=None):
    rng = rng or np.random.default_rng(5)
    top, left = border
    ah, aw = h - top, w - left
    rgb = rng.uniform(0.05, 0.9, size=(3, ah, aw)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB", black=black, white=15000.0)
    sensor = np.full((h, w), black, np.float64)
    sensor += rng.normal(0, 2.0, size=(h, w))
    # active area phase: (top, left) even keeps RGGB at the active origin
    sensor[top:, left:] = frame.cfa
    return (np.clip(np.round(sensor), 0, 16383).astype(np.uint16),
            frame, (top, left))


@pytest.mark.parametrize("n_slices", [0, 2])
def test_cr2_roundtrip_slices(tmp_path, n_slices):
    sensor, frame, (top, left) = _make_sensor()
    p = str(tmp_path / "shot.cr2")
    write_cr2(p, sensor, n_slices=n_slices, sensor_border=(top, left,
                                                          None, None))
    fr = load_raw(p)
    assert fr.pattern == "RGGB"
    assert fr.cfa.shape == frame.cfa.shape
    # decoded active area must match the encoded mosaic bit-exactly
    np.testing.assert_array_equal(
        fr.cfa, sensor[top:, left:].astype(np.float32))


def test_cr2_metadata(tmp_path):
    sensor, frame, (top, left) = _make_sensor()
    p = str(tmp_path / "shot.cr2")
    write_cr2(p, sensor, n_slices=2, iso=800,
              wb_rggb=(2500, 1024, 1024, 1800),
              sensor_border=(top, left, None, None))
    fr = load_raw(p)
    assert fr.make == "Canon"
    assert fr.model == "EOS SYNTH"
    assert fr.iso == 800
    # WB multipliers: cam_mul ~ (R_gain, 1, B_gain) from ColorData RGGB
    assert fr.cam_mul is not None
    np.testing.assert_allclose(fr.cam_mul[0], 2500 / 1024, rtol=1e-3)
    np.testing.assert_allclose(fr.cam_mul[2], 1800 / 1024, rtol=1e-3)
    # black estimated from the masked border (encoded at ~256)
    assert np.all(np.abs(fr.black - 256.0) < 8.0)
    # white from ljpeg precision
    assert np.all(fr.white >= 16000)


def test_cr2_odd_left_border_shifts_phase(tmp_path):
    # odd left border: active area starts on a G column -> GRBG
    rng = np.random.default_rng(7)
    h, w, top, left = 64, 96, 4, 9
    sensor = np.full((h, w), 256.0)
    rgb = rng.uniform(0.1, 0.8, size=(3, h - top, w - left)).astype(np.float32)
    fr_syn = synthesize_bayer(rgb, pattern="GRBG", black=256.0, white=15000.0)
    sensor[top:, left:] = fr_syn.cfa
    p = str(tmp_path / "odd.cr2")
    write_cr2(p, np.round(sensor).astype(np.uint16), n_slices=0,
              sensor_border=(top, left, None, None))
    fr = load_raw(p)
    assert fr.pattern == "GRBG"
