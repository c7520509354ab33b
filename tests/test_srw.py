"""Native Samsung SRW decode path.

Oracle: tests/util_srw.py synthetic writer (written from the format
behavior of dcraw.cc samsung_load_raw/samsung2_load_raw/
samsung3_load_raw) plus a hand-assembled v2 bitstream vector whose
expected pixels were computed by hand — NOT produced by any repo
encode/decode code."""

import numpy as np

from art_tpu.io.rawfile import load_raw
from tests.util_srw import write_srw


def _smooth_mosaic(rng, bps, shape=(64, 96)):
    import cv2

    base = rng.integers(500, (1 << bps) - 600, size=(12, 16))
    m = cv2.resize(base.astype(np.float32), shape[::-1],
                   interpolation=cv2.INTER_LINEAR)
    m = m + rng.normal(0, 12, m.shape)
    return m.clip(0, (1 << bps) - 1).astype(np.uint16)


def test_srw_v0_roundtrip(tmp_path):
    rng = np.random.default_rng(10)
    mosaic = _smooth_mosaic(rng, 12)
    p = str(tmp_path / "nx10.srw")
    write_srw(p, mosaic, variant=0)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "RGGB"
    assert fr.white[0] == 4095


def test_srw_v2_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    mosaic = _smooth_mosaic(rng, 12)
    p = str(tmp_path / "nx200.srw")
    write_srw(p, mosaic, variant=2)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))


def test_srw_v3_roundtrip(tmp_path):
    rng = np.random.default_rng(12)
    mosaic = _smooth_mosaic(rng, 12)
    p = str(tmp_path / "nx1.srw")
    write_srw(p, mosaic, variant=3)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))


def test_srw_metadata_and_wb(tmp_path):
    rng = np.random.default_rng(13)
    mosaic = _smooth_mosaic(rng, 12, (32, 48))
    p = str(tmp_path / "meta.srw")
    write_srw(p, mosaic, variant=3, iso=800, model="SYNTH NX1",
              wb_rg1g2b=(8392, 4196, 4196, 6244),
              wb_sub=(200, 100, 100, 100))
    fr = load_raw(p)
    assert fr.make.startswith("SAMSUNG")
    assert fr.model == "SYNTH NX1"
    assert fr.iso == 800
    # levels minus subtract offsets: R=8192 G=4096 B=6144
    np.testing.assert_allclose(fr.cam_mul[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(fr.cam_mul[2], 6144.0 / 4096.0, rtol=1e-6)


def test_srw_v2_hand_vector(tmp_path):
    """Bit-exact hand-built v2 stream.

    Canonical codes from the fixed table's 10-bit LUT layout (length,
    category) in listed order: cat4=000(3) cat7=001(3) cat6=01(2)
    cat5=10(2) cat3=1100(4) cat0=110100(6) ... cat8=1110(4).
    Pixels [[100,200,110,210],[50,60,55,65]]: the first two columns seed
    per-row-parity vertical predictors (start 0), later columns predict
    from two back at the same parity:
      row0: 100(cat7) 200(cat8) +10(cat4) +10(cat4)
      row1:  50(cat6)  60(cat6)  +5(cat3)  +5(cat3)
    Bits: 001 1100100 | 1110 11001000 | 000 1010 | 000 1010 |
          01 110010 | 01 111100 | 1100 101 | 1100 101
    """
    bits = ("0011100100" "111011001000" "0001010" "0001010"
            "01110010" "01111100" "1100101" "1100101")
    n = (len(bits) + 7) // 8 * 8
    payload = int(bits.ljust(n, "0"), 2).to_bytes(n // 8, "big")
    expected = np.array([[100, 200, 110, 210], [50, 60, 55, 65]],
                        dtype=np.float32)
    p = str(tmp_path / "hand.srw")
    write_srw(p, np.zeros((2, 4), np.uint16), variant=2, payload=payload)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, expected)
