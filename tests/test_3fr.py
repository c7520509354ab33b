"""Native Hasselblad 3FR decode path.

Oracle: tests/util_3fr.py synthetic writer (behavioral spec:
dcraw.cc hasselblad_load_raw) plus a hand-assembled ph1-word bitstream
vector whose expected pixels were computed by hand — NOT produced by
any repo encode/decode code."""

import struct

import numpy as np

from art_tpu.io.rawfile import load_raw
from tests.util_3fr import _ljpeg_header, write_3fr


def _mosaic(rng, shape=(32, 48)):
    import cv2

    base = rng.integers(2000, 60000, size=(8, 12))
    m = cv2.resize(base.astype(np.float32), shape[::-1],
                   interpolation=cv2.INTER_LINEAR)
    return m.clip(0, 65535).astype(np.uint16)


def test_3fr_roundtrip_psv1(tmp_path):
    rng = np.random.default_rng(30)
    mosaic = _mosaic(rng)
    p = str(tmp_path / "h3d.3fr")
    write_3fr(p, mosaic, psv=1)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "GRBG"  # dcraw filters 0x61616161
    assert fr.white[0] == 65535


def test_3fr_roundtrip_psv11_vertical_predictor(tmp_path):
    rng = np.random.default_rng(31)
    mosaic = _mosaic(rng, (24, 32))
    p = str(tmp_path / "h4d.3fr")
    write_3fr(p, mosaic, psv=11, model="SYNTH H4D-40", iso=400)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.model == "SYNTH H4D-40"
    assert fr.iso == 400


def test_3fr_hand_vector(tmp_path):
    # 2x2 image, psv=1, 5-bit length codes (code == value).
    # Row 0, col pair (0,1): preds are 0x8000.
    #   pixel(0,0)=0x8003 -> d=+3  -> len 2, bits "11"
    #   pixel(0,1)=0x7FFF -> d=-1  -> len 1, bit  "0"
    #   stream: 00010 00001 | 11 | 0
    # Row 1: preds again 0x8000 (col==0).
    #   pixel(1,0)=0x8000 -> d=0   -> len 0, no bits
    #   pixel(1,1)=0x8004 -> d=+4  -> len 3, bits "100"
    #   stream: 00000 00011 | (none) | 100
    # concatenated MSB-first: 00010 00001 11 0 00000 00011 100
    # = 0001000001 1100000000 011100 -> bytes 0x41 0xC0 0x1C padded to a
    # 32-bit LE word: bits 00010000 01110000 00000111 00xxxxxx
    bits = "00010" + "00001" + "11" + "0" + "00000" + "00011" + "100"
    bits = bits.ljust(32, "0")
    word = int(bits, 2)
    payload = struct.pack("<I", word)
    blob = _ljpeg_header(2, 2, 1) + payload
    p = str(tmp_path / "vector.3fr")
    write_3fr(p, np.zeros((2, 2), np.uint16), payload=blob)
    fr = load_raw(p)
    expected = np.array([[0x8003, 0x7FFF],
                         [0x8000, 0x8004]], np.float32)
    np.testing.assert_array_equal(fr.cfa, expected)
