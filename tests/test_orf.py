"""Olympus ORF native decode (reference: dcraw.cc olympus_load_raw)."""

import numpy as np
import pytest

from util_orf import write_orf

from art_tpu.io.rawfile import load_raw


def _mosaic(h, w, seed=0, lo=100, hi=3600):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(h, w)).astype(np.uint16)


def test_orf_roundtrip(tmp_path):
    """Compressed stream: carry-adaptive codes + gradient predictor are
    bit-exact."""
    m = _mosaic(40, 56)
    path = write_orf(tmp_path / "a.orf", m)
    frame = load_raw(path)
    assert frame.pattern == "RGGB"
    assert frame.cfa.shape == (40, 56)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_orf_roundtrip_smooth(tmp_path):
    """Flat regions keep carry[0] small -> the nbits ladder stays at its
    floor and carry[2] saturates (the i=0 regime)."""
    m = np.full((32, 48), 2048, np.uint16)
    m[10:20, 12:30] = 2052
    path = write_orf(tmp_path / "b.orf", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_orf_roundtrip_extremes(tmp_path):
    """Full-range jumps drive carry[0] high: exercises the escape path
    (12 zeros + explicit (16-nbits)-bit field) and wide nbits."""
    rng = np.random.default_rng(3)
    m = rng.integers(0, 4096, size=(24, 40)).astype(np.uint16)
    m[0, 0] = 4095
    m[0, 1] = 0
    m[1, 0] = 4095
    m[0, 2] = 0
    path = write_orf(tmp_path / "c.orf", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_orf_gradient_predictor(tmp_path):
    """Monotone ramps hit the w<nw<n median branch; a step edge hits the
    |w-nw|>32 plane-continuation branch."""
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    m = (200 + 9 * xx + 13 * yy).astype(np.uint16)
    m[:, 24:] += 900
    path = write_orf(tmp_path / "d.orf", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_orf_uncompressed16(tmp_path):
    m = _mosaic(24, 32, hi=60000)
    path = write_orf(tmp_path / "u.orf", m, compressed=False)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_orf_metadata(tmp_path):
    """MakerNote 0x2040 sub-IFD: WB (0x0100, x256) and color-indexed
    blacks (0x0600) are harvested (dcraw parse_makernote :5812-5820)."""
    m = _mosaic(16, 24)
    path = write_orf(tmp_path / "m.orf", m, wb_rb=(2.25, 1.5),
                     black_rg1bg2=(255, 256, 254, 257))
    frame = load_raw(path)
    assert frame.make.startswith("OLYMPUS")
    assert "E-M1SYNTH" in frame.model
    assert frame.cam_mul is not None
    assert np.allclose(frame.cam_mul[0] / frame.cam_mul[1], 2.25,
                       rtol=1e-3)
    assert np.allclose(frame.cam_mul[2] / frame.cam_mul[1], 1.5,
                       rtol=1e-3)
    # c4 order (R, G1, B, G2) from the stored color-indexed values
    assert list(np.asarray(frame.black).astype(int)) == [255, 256, 254, 257]


def test_orf_truncated_stream_fails(tmp_path):
    """A corrupt (overrunning) stream must not silently produce pixels:
    values leaving the 12-bit range flag a decode error (dcraw
    derror())."""
    m = _mosaic(24, 32)
    path = write_orf(tmp_path / "t.orf", m,
                     payload=b"\x00" * 7 + b"\xff" * 16)
    with pytest.raises(Exception):
        load_raw(path)


def test_orf_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    m = (600 + 8 * xx + 5 * yy).astype(np.uint16)
    path = write_orf(tmp_path / "dev.orf", m)
    out = np.asarray(process_image(load_raw(path), ProcParams()))
    assert out.shape[0] == 3
    assert float(np.mean(out)) > 0.01
