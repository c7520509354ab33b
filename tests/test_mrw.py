"""Native Minolta MRW decode path.

Oracle: tests/util_mrw.py synthetic writer (behavioral spec:
dcraw.cc parse_minolta :7304 + packed_load_raw) plus a hand-packed
12-bit vector whose expected bytes were computed by hand — NOT produced
by any repo encode/decode code."""

import struct

import numpy as np

from art_tpu.io.rawfile import load_raw
from tests.util_mrw import write_mrw


def _mosaic(rng, shape=(64, 96)):
    return rng.integers(30, 4050, size=shape).astype(np.uint16)


def test_mrw_packed12_roundtrip(tmp_path):
    rng = np.random.default_rng(20)
    mosaic = _mosaic(rng)
    p = str(tmp_path / "dynax7d.mrw")
    write_mrw(p, mosaic, storage=0x59)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "RGGB"
    assert fr.white[0] == 4095


def test_mrw_unpacked16_roundtrip(tmp_path):
    rng = np.random.default_rng(21)
    mosaic = _mosaic(rng, (32, 48))
    p = str(tmp_path / "dimage7.mrw")
    write_mrw(p, mosaic, storage=0x52, model="DiMAGE 7Hi")
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))


def test_mrw_metadata_wb_and_a200_pattern(tmp_path):
    rng = np.random.default_rng(22)
    mosaic = _mosaic(rng, (32, 48))
    p = str(tmp_path / "a200.mrw")
    write_mrw(p, mosaic, storage=0x59, model="DiMAGE A200", iso=400,
              wb_rg1g2b=(512, 256, 256, 384), orientation=6)
    fr = load_raw(p)
    assert fr.model == "DiMAGE A200"
    assert fr.iso == 400
    assert fr.pattern == "GBRG"  # dcraw.cc:10170 filters=0x49494949
    # gains R=512 G=256 B=384 -> multipliers 2.0 / 1.0 / 1.5
    np.testing.assert_allclose(fr.cam_mul[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(fr.cam_mul[2], 1.5, rtol=1e-6)


def test_mrw_hand_packed_vector(tmp_path):
    # 2x4 12-bit samples packed MSB-first by hand: each value pair
    # (a, b) becomes 3 bytes a>>4, (a&0xF)<<4 | b>>8, b&0xFF:
    # values 0x123 0x456 0x789 0xABC 0x0FF 0xF00 0x321 0x654
    # -> bytes 12 34 56 | 78 9A BC | 0F FF 00 | 32 16 54
    payload = bytes((0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC,
                     0x0F, 0xFF, 0x00, 0x32, 0x16, 0x54))
    expected = np.array([[0x123, 0x456, 0x789, 0xABC],
                         [0x0FF, 0xF00, 0x321, 0x654]], np.uint16)
    p = str(tmp_path / "vector.mrw")
    write_mrw(p, np.zeros((2, 4), np.uint16), storage=0x59,
              payload=payload)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, expected.astype(np.float32))
