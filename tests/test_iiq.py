"""Native Phase One IIQ decode path.

Oracle: tests/util_iiq.py synthetic writer (behavioral spec:
dcraw.cc parse_phase_one + phase_one_load_raw_c) plus a hand-assembled
raw-16 tail vector whose expected pixels were computed by hand — NOT
produced by any repo encode/decode code."""

import struct

import numpy as np

from art_tpu.io.rawfile import load_raw
from tests.util_iiq import write_iiq


def _mosaic(rng, shape=(24, 32)):
    import cv2

    base = rng.integers(1000, 60000, size=(6, 8))
    m = cv2.resize(base.astype(np.float32), shape[::-1],
                   interpolation=cv2.INTER_LINEAR)
    return (m.clip(0, 65532).astype(np.int64) & ~3).astype(np.uint16)


def test_iiq_roundtrip_fmt6(tmp_path):
    rng = np.random.default_rng(40)
    mosaic = _mosaic(rng)
    p = str(tmp_path / "iq180.iiq")
    write_iiq(p, mosaic, fmt=6)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "RGGB"
    assert fr.make == "Phase One"
    assert fr.model == "SYNTH IQ180"
    # wb 2.0/1.0/1.5 -> multipliers
    np.testing.assert_allclose(fr.cam_mul[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(fr.cam_mul[2], 1.5, rtol=1e-6)


def test_iiq_black_and_split_corrections(tmp_path):
    rng = np.random.default_rng(41)
    h, w = 16, 24
    mosaic = _mosaic(rng, (h, w))
    black_col = np.tile(np.array([[8, -4]], np.int16), (h, 1))
    black_row = np.tile(np.array([[-12, 16]], np.int16), (w, 1))
    p = str(tmp_path / "corr.iiq")
    write_iiq(p, mosaic, fmt=6, black=64, black_col=black_col,
              black_row=black_row, split_col=w // 2, split_row=h // 2)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    # white level follows ph1.black (0xfffc - black)
    assert fr.white[0] == 0xFFFC - 64


def test_iiq_fmt5_toe_curve(tmp_path):
    # stored samples < 256 pass through curve[i] = i*i/3.969 + .5
    h, w = 2, 8
    stored = np.array([[0, 10, 100, 200, 255, 300, 1000, 4000],
                       [5, 50, 150, 250, 260, 512, 2048, 8191]], np.int64)
    curve = (stored * stored / 3.969 + 0.5).astype(np.int64)
    expect = np.where(stored < 256, curve, stored) << 2
    p = str(tmp_path / "fmt5.iiq")
    write_iiq(p, (stored << 2).astype(np.uint16), fmt=5)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, expect.astype(np.float32))


def test_iiq_hand_vector_raw16_tail(tmp_path):
    # width 4 < 8: every column is in the raw-16 tail, so each row's
    # stream is just four 16-bit samples MSB-first in LE 32-bit words.
    # row: samples 0x1234 0x0042 0xBEEF 0x0103
    bits = "".join(format(v, "016b")
                   for v in (0x1234, 0x0042, 0xBEEF, 0x0103))
    words = [int(bits[i:i + 32], 2) for i in (0, 32)]
    row = b"".join(struct.pack("<I", wd) for wd in words)
    p = str(tmp_path / "vector.iiq")
    write_iiq(p, np.zeros((1, 4), np.uint16), fmt=6, payload_rows=[row])
    fr = load_raw(p)
    expected = (np.array([[0x1234, 0x0042, 0xBEEF, 0x0103]], np.int64)
                << 2) & 0xFFFF
    # <<2 of 0xBEEF overflows u16 exactly as the reference's ushort does
    np.testing.assert_array_equal(fr.cfa, expected.astype(np.float32))
