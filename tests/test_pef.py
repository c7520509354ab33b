"""Native Pentax PEF decode path.

Oracle: tests/util_pef.py synthetic writer (written from the format
description, dcraw.cc pentax_load_raw as behavioral spec) plus a
hand-assembled bitstream vector whose expected pixels were computed by
hand — NOT produced by any repo encode/decode code."""

import numpy as np
import pytest

from art_tpu.io.rawfile import load_raw
from tests.util_pef import write_pef


def _smooth_mosaic(rng, bps, shape=(64, 96)):
    import cv2

    base = rng.integers(500, (1 << bps) - 600, size=(12, 16))
    m = cv2.resize(base.astype(np.float32), shape[::-1],
                   interpolation=cv2.INTER_LINEAR)
    m = m + rng.normal(0, 12, m.shape)
    return m.clip(0, (1 << bps) - 1).astype(np.uint16)


def test_pef_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    mosaic = _smooth_mosaic(rng, 12)
    p = str(tmp_path / "shot.pef")
    write_pef(p, mosaic)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "RGGB"
    assert fr.white[0] == 4095


def test_pef_metadata_and_wb(tmp_path):
    rng = np.random.default_rng(5)
    mosaic = _smooth_mosaic(rng, 12, (32, 48))
    p = str(tmp_path / "meta.pef")
    write_pef(p, mosaic, iso=800, model="SYNTH K-3",
              wb_rg1g2b=(8192, 4096, 4096, 6144))
    fr = load_raw(p)
    assert fr.make.startswith("PENTAX")
    assert fr.model == "SYNTH K-3"
    assert fr.iso == 800
    # as_shot_neutral = g/wp_r, 1, g/wp_b -> cam_mul R = wp_r/g = 2.0
    np.testing.assert_allclose(fr.cam_mul[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(fr.cam_mul[2], 6144.0 / 4096.0, rtol=1e-6)


def test_pef_black_remap_bggr(tmp_path):
    """Tag 0x200 blacks (stored R,G1,G2,B) must land on CFA positions by
    color, not positionally (dcraw cblack[c ^ (c >> 1)] semantics)."""
    rng = np.random.default_rng(6)
    mosaic = _smooth_mosaic(rng, 12, (32, 48))
    p = str(tmp_path / "bggr.pef")
    write_pef(p, mosaic, pattern="BGGR", black_rggb=(100, 110, 120, 130))
    fr = load_raw(p)
    assert fr.pattern == "BGGR"
    # RawFrame.black is c4 (R, G1, B, G2); a positional (unmapped)
    # assignment would surface as [130, 110, 100, 120]
    np.testing.assert_array_equal(fr.black, [100, 110, 130, 120])


def test_pef_hand_vector(tmp_path):
    """Bit-exact hand-built stream (see byte derivation below).

    Canonical codes for category lengths (2,3,3,3,3,3,4,5,6,7,8,9,9):
      cat0=00 cat3=100 cat4=101 cat6=1110 cat7=11110 cat8=111110
    Pixels [[100,200,110,210],[50,60,55,65]] encode as diffs
    (vpred starts 0; col>=2 predicts from two back):
      row0: 100(cat7) 200(cat8) +10(cat4) +10(cat4)
      row1:  50(cat6)  60(cat6)  +5(cat3)  +5(cat3)
    Bits: 11110 1100100 | 111110 11001000 | 101 1010 | 101 1010 |
          1110 110010 | 1110 111100 | 100 101 | 100 101
    = 0xF6 0x4F 0xB2 0x2D 0x5A 0xEC 0xBB 0xC9 0x65
    """
    payload = bytes((0xF6, 0x4F, 0xB2, 0x2D, 0x5A, 0xEC, 0xBB, 0xC9, 0x65))
    expected = np.array([[100, 200, 110, 210], [50, 60, 55, 65]],
                        dtype=np.float32)
    p = str(tmp_path / "vec.pef")
    write_pef(p, expected.astype(np.uint16), payload=payload)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, expected)


def test_pef_corrupt_stream_rejected(tmp_path):
    """Out-of-range predictor sums must fail decode, not wrap (dcraw
    flags hpred >> tiff_bps as a data error)."""
    mosaic = np.full((32, 32), 100, dtype=np.uint16)
    p = str(tmp_path / "bad.pef")
    # every pixel codes +255 (cat8): along a row the two-back chain gains
    # +255 per step (16 steps) and vpred accumulates +255 per row pair,
    # so values pass 4095 well before the end of the stream
    from tests.util_nef import _BitWriter

    bw = _BitWriter()
    for _ in range(32 * 32):
        bw.put(0b111110, 6)
        bw.put(255, 8)
    write_pef(p, mosaic, payload=bw.flush())
    with pytest.raises(Exception):
        load_raw(p)
