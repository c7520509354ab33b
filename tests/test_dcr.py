"""Kodak DCR native decode tests (dcraw.cc kodak_65000_decode :3199)."""

import numpy as np

from art_tpu.io.dng import load_dng
from tests.util_dcr import encode_segment, write_dcr


def test_dcr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4096, size=(24, 512))
    p = tmp_path / "t.dcr"
    expected = write_dcr(p, idx)
    frame = load_dng(p)
    assert frame.pattern == "RGGB"
    assert frame.cfa.shape == (24, 512)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_dcr_curve_and_wb(tmp_path):
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4096, size=(16, 256))
    curve = np.minimum(np.arange(4096) * 3, 12000).astype(np.uint16)
    p = tmp_path / "c.dcr"
    expected = write_dcr(p, idx, curve=curve, wb_rgb=(1024, 2048, 1365))
    frame = load_dng(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
    # white = curve[0xfff]
    assert frame.white[0] == curve[0xFFF]
    # cam_mul = 2048/x normalized to G: (2048/1024)/(2048/2048) = 2
    m = frame.cam_mul
    assert m is not None
    np.testing.assert_allclose(m[0], 2.0, rtol=1e-3)
    np.testing.assert_allclose(m[2], 2048 / 1365, rtol=1e-3)


def test_dcr_segment_vector():
    """Independent hand-check of the bit layout: diffs (5, -2, 0, 3)
    -> lengths 3,2,0,2; logical bitstream LSB-first: 101 then 01 then
    11; nibbles 0x23, 0x20; one prefill word (bsize=4 -> bsize&7==4)."""
    seg = encode_segment([5, -2, 0, 3])
    assert seg[0] == 0x23 and seg[1] == 0x20
    # bits: mag(5)=101 (LSB first 1,0,1), mag(-2)=01 (d+3=1: bits 1,0),
    # mag(3)=11 -> stream 1,0,1,1,0,1,1 -> word0 = 0b1101101 = 0x6D
    w0 = (seg[2] << 8) | seg[3]
    assert w0 == 0b1101101, bin(w0)


def test_dcr_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    rng = np.random.default_rng(3)
    idx = rng.integers(100, 3995, size=(64, 256))
    p = tmp_path / "dev.dcr"
    write_dcr(p, idx)
    out = tmp_path / "dev.jpg"
    process_image(str(p), ProcParams(), output_path=str(out))
    assert out.exists()
