"""Sony ARW2 native decode tests.

Reference behavior boundary: dcraw.cc sony_arw2_load_raw (block layout,
curve tag 28688, WB tag 29459) + camconst per-ISO levels.
"""

import numpy as np
import pytest

from art_tpu.io.rawfile import load_raw
from tests.util_arw import (decode_arw2_block, encode_arw2_block,
                            sony_curve, write_arw2)


def _lossless_mosaic(h, w, seed=0):
    """Per-block spans < 128 so the 7-bit deltas are exact (sh=0)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 0x7FF - 127, size=(h, w // 32, 2))
    off = rng.integers(0, 128, size=(h, w))
    pix = np.zeros((h, w), np.int64)
    for span in range(w // 32):
        for phase in (0, 1):
            cols = span * 32 + phase + 2 * np.arange(16)
            pix[:, cols] = base[:, span, phase][:, None] + off[:, cols]
    return pix


def test_arw2_roundtrip(tmp_path):
    pix = _lossless_mosaic(48, 64)
    p = tmp_path / "t.arw"
    expected = write_arw2(p, pix)
    frame = load_raw(p)
    assert frame.pattern == "RGGB"
    assert frame.cfa.shape == (48, 64)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
    # curve output is ~14-bit: the slope-16 segment must have fired
    assert expected.max() > 4095


def test_arw2_wb_levels(tmp_path):
    pix = _lossless_mosaic(32, 64, seed=1)
    p = tmp_path / "wb.arw"
    write_arw2(p, pix, wb_rggb=(2100, 1024, 1024, 1800))
    frame = load_raw(p)
    # cam_mul ~ 1/neutral normalized to G=1
    m = frame.cam_mul
    assert m is not None
    np.testing.assert_allclose(m[0], 2100 / 1024, rtol=1e-6)
    np.testing.assert_allclose(m[1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(m[2], 1800 / 1024, rtol=1e-6)
    # unknown model: conservative ARW2 white level
    assert frame.white[0] == 16300


def test_arw2_camconst_levels(tmp_path):
    pix = _lossless_mosaic(32, 64, seed=2)
    p = tmp_path / "cc.arw"
    write_arw2(p, pix, model="ILCE-7M3", iso=100)
    frame = load_raw(p)
    # bundled camconst: Sony ILCE-7M3 black 512, white 16200 @ ISO100
    assert frame.black[0] == 512
    assert frame.white[0] == 16200
    assert frame.cam_xyz is not None  # dcraw_matrix from camconst


def test_arw2_lossy_blocks_match_python_decoder(tmp_path):
    """Wide-span blocks exercise the shift path (sh>0); the C++ decode
    must agree with an independent pure-Python block decoder."""
    rng = np.random.default_rng(3)
    h, w = 16, 64
    pix = rng.integers(0, 0x800, size=(h, w)).astype(np.int64)
    p = tmp_path / "lossy.arw"
    write_arw2(p, pix)
    frame = load_raw(p)
    curve = sony_curve()

    expected = np.zeros((h, w), np.uint16)
    for row in range(h):
        for span in range(0, w, 32):
            for phase in (0, 1):
                vals = [pix[row, span + phase + 2 * k] for k in range(16)]
                dec = decode_arw2_block(encode_arw2_block(vals))
                for k, v in enumerate(dec):
                    expected[row, span + phase + 2 * k] = curve[(v << 1)
                                                                & 0xFFF]
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_arw_lossless_roundtrip(tmp_path):
    """Compression-7 (LJ92 2x2-quad tiles) lossless path is bit-exact."""
    from tests.util_arw import write_arw_lossless

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 16384, size=(64, 96)).astype(np.int64)
    p = tmp_path / "ll.arw"
    expected = write_arw_lossless(p, pix, tile=(32, 16))
    frame = load_raw(p)
    assert frame.pattern == "RGGB"
    assert frame.cfa.shape == (64, 96)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
    # 14-bit container white level
    assert frame.white[0] == 16383


def test_arw_lossless_single_tile_and_partial_edge(tmp_path):
    """One tile covering the image, and a tile grid that overhangs the
    right/bottom edge (tile-padded region must be discarded)."""
    from tests.util_arw import write_arw_lossless

    rng = np.random.default_rng(8)
    pix = rng.integers(0, 16384, size=(48, 80)).astype(np.int64)
    p = tmp_path / "ll1.arw"
    expected = write_arw_lossless(p, pix, tile=(80, 48))
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)

    p2 = tmp_path / "ll2.arw"
    expected = write_arw_lossless(p2, pix, tile=(64, 32))  # overhang
    frame = load_raw(p2)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_arw_lossless_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop
    from tests.util_arw import write_arw_lossless

    rng = np.random.default_rng(9)
    pix = (rng.integers(600, 12000, size=(64, 96))).astype(np.int64)
    p = tmp_path / "lldev.arw"
    write_arw_lossless(p, pix, model="ILCE-7M3")
    frame = load_raw(p)
    # camconst levels still apply to the lossless container
    assert frame.black[0] == 512
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    out = np.asarray(develop(frame, pp))
    assert out.shape == (3, 64, 96)
    assert np.isfinite(out).all()


def test_arw2_develops(tmp_path):
    """End-to-end: ARW2 file through the full develop pipeline."""
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop

    pix = _lossless_mosaic(64, 96, seed=4)
    p = tmp_path / "dev.arw"
    write_arw2(p, pix)
    frame = load_raw(p)
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    out = np.asarray(develop(frame, pp))
    assert out.shape == (3, 64, 96)
    assert np.isfinite(out).all()
    assert out.max() > 0.01
