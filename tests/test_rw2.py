"""Panasonic RW2 native decode tests.

Reference behavior boundary: rtengine/panasonic_decoders.cc (legacy,
v5, cs6, cs7 streams) + dcraw.cc RW2 tag block.
"""

import numpy as np

from art_tpu.io.rawfile import load_raw
from tests.util_rw2 import write_rw2


def test_rw2_cs7_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    h, w = 32, 36  # 36 = 4 blocks of 9 pixels (14-bit)
    pix = rng.integers(0, 1 << 14, size=(h, w)).astype(np.int64)
    p = tmp_path / "cs7.rw2"
    write_rw2(p, pix, encoding=7, bpp=14)
    frame = load_raw(p)
    assert frame.pattern == "RGGB"
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_cs7_12bit(tmp_path):
    rng = np.random.default_rng(1)
    h, w = 16, 40  # 4 blocks of 10 pixels (12-bit)
    pix = rng.integers(0, 1 << 12, size=(h, w)).astype(np.int64)
    p = tmp_path / "cs7b.rw2"
    write_rw2(p, pix, encoding=7, bpp=12)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_v5_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    h, w = 24, 40
    pix = rng.integers(0, 1 << 12, size=(h, w)).astype(np.int64)
    p = tmp_path / "v5.rw2"
    write_rw2(p, pix, encoding=5, bpp=12)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_v5_14bit(tmp_path):
    rng = np.random.default_rng(3)
    h, w = 24, 36
    pix = rng.integers(0, 1 << 14, size=(h, w)).astype(np.int64)
    p = tmp_path / "v5b.rw2"
    write_rw2(p, pix, encoding=5, bpp=14)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_cs6_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    h, w = 32, 44  # 4 blocks of 11 pixels
    pix = np.zeros((h, w), np.int64)
    # first two pixels of each block: raw 14-bit fields; the rest:
    # (v + 0xf) divisible by 16 (base-4 multiplier encoding)
    for col in range(0, w, 11):
        pix[:, col] = rng.integers(0, 0x3FF0, size=h)
        pix[:, col + 1] = rng.integers(0, 0x3FF0, size=h)
        s = rng.integers(1, 0x3FF, size=(h, 9))
        pix[:, col + 2 : col + 11] = 16 * s - 0xF
    p = tmp_path / "cs6.rw2"
    write_rw2(p, pix, encoding=6)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_legacy_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    h, w = 20, 56  # four 14-col predictor groups per row
    # random walk per parity chain, bounded deltas for sh=0 encoding
    pix = np.zeros((h, w), np.int64)
    for row in range(h):
        for g in range(0, w, 14):
            vals = [0, 0]
            for i in range(14):
                par = i & 1
                if i < 2:
                    vals[par] = int(rng.integers(200, 3800))
                else:
                    vals[par] = int(np.clip(
                        vals[par] + rng.integers(-100, 101), 200, 3800))
                pix[row, g + i] = vals[par]
    p = tmp_path / "legacy.rw2"
    write_rw2(p, pix, encoding=0)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), pix)


def test_rw2_meta(tmp_path):
    rng = np.random.default_rng(6)
    pix = rng.integers(0, 1 << 12, size=(32, 40)).astype(np.int64)
    p = tmp_path / "meta.rw2"
    write_rw2(p, pix, encoding=7, bpp=12, wb_rgb=(520, 256, 410),
              blacks=(143, 142, 141), cfa=4, iso=800)
    frame = load_raw(p)
    assert frame.pattern == "BGGR"
    # per-channel blacks in pattern-c4 order (R, G1, B, G2)
    assert frame.black[0] == 143 and frame.black[2] == 141
    assert frame.black[1] == 142 and frame.black[3] == 142
    m = frame.cam_mul
    np.testing.assert_allclose(m[0], 520 / 256, rtol=1e-6)
    np.testing.assert_allclose(m[2], 410 / 256, rtol=1e-6)
    assert frame.iso == 800


def test_rw2_borders_crop(tmp_path):
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 1 << 12, size=(32, 40)).astype(np.int64)
    p = tmp_path / "crop.rw2"
    write_rw2(p, pix, encoding=7, bpp=12, borders=(2, 4, 30, 36))
    frame = load_raw(p)
    assert frame.cfa.shape == (28, 32)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64),
                                  pix[2:30, 4:36])


def test_rw2_camconst_pedestal(tmp_path):
    """camconst black is a pedestal ADDED to the per-channel tag blacks
    (dcraw merges the global black into cblack)."""
    rng = np.random.default_rng(8)
    pix = rng.integers(0, 1 << 12, size=(32, 40)).astype(np.int64)
    p = tmp_path / "ped.rw2"
    write_rw2(p, pix, encoding=7, bpp=12, model="DMC-GX80",
              blacks=(143, 142, 141), iso=200)
    frame = load_raw(p)
    # bundled camconst: Panasonic DMC-GX80 black 16, white 4080 @ ISO200
    assert frame.black[0] == 143 + 16
    assert frame.white[0] == 4080


def test_rw2_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop

    rng = np.random.default_rng(9)
    pix = rng.integers(200, 4000, size=(64, 90)).astype(np.int64)
    p = tmp_path / "dev.rw2"
    write_rw2(p, pix, encoding=7, bpp=12)
    frame = load_raw(p)
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    out = np.asarray(develop(frame, pp))
    assert out.shape == (3, 64, 90)
    assert np.isfinite(out).all()
