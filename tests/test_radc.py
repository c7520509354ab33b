"""Kodak RADC native decode tests (dcraw.cc kodak_radc_load_raw :2830;
identify routing :10555-10582): DC40/DC50 KDC, Apple QuickTake 150,
Logitech Fotoman Pixtura."""

import numpy as np
from util_radc import (radc_expected, write_kdc_radc, write_pxn,
                       write_qktn)

from art_tpu.io.rawfile import load_raw


def test_qktn_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    qm = rng.integers(0, 32, size=(48, 64))
    p = tmp_path / "t.qtk"
    expected = write_qktn(p, qm)
    frame = load_raw(p)
    assert frame.pattern == "GRBG"
    assert frame.cfa.shape == (48, 64)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
    assert frame.white[0] == 0x3FFF


def test_qktn_indicator_738(tmp_path):
    rng = np.random.default_rng(1)
    qm = rng.integers(0, 32, size=(16, 32))
    p = tmp_path / "i.qtk"
    expected = write_qktn(p, qm, indicator=30)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_kdc_dc40_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    qm = rng.integers(0, 32, size=(512, 768))
    p = tmp_path / "t.kdc"
    expected = write_kdc_radc(p, qm, model="40")
    frame = load_raw(p)
    assert frame.pattern == "GRBG"
    assert frame.cfa.shape == (512, 768)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_kdc_dc50_cbpp243(tmp_path):
    """DC50-class files carry CompressedBitsPerPixel 243, which selects
    the coarser 6-bit literal quantizer, and park the stream at 19712."""
    rng = np.random.default_rng(3)
    qm = rng.integers(0, 64, size=(512, 768))
    p = tmp_path / "t50.kdc"
    expected = write_kdc_radc(p, qm, model="DC50", cbpp=243)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16),
                                  radc_expected(qm, s=2))
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_pxn_dispatch(tmp_path):
    rng = np.random.default_rng(4)
    qm = rng.integers(0, 32, size=(512, 768))
    p = tmp_path / "t.pxn"
    expected = write_pxn(p, qm)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_radc_hand_vector(tmp_path):
    """4x4 literal-only stream assembled BY HAND from the bitstream
    semantics — never produced by the test encoder.

    Band header: three 6-bit multipliers 16 = 010000.
    Each half-row pass: the tree-selection token for value 8 from
    context table 1 is the canonical length-8 code 11111111 (table 1
    lists lengths 1,2,3,4,5,6,7,8,8 for values 0,1,3,4,2,7,6,5,8);
    the 4 literals that follow are 5-bit (s=3) top-bit codes, read in
    (y=1,x=col+1),(y=1,x=col),(y=2,x=col+1),(y=2,x=col) order.
    Literal q decodes to pixel (q<<3 | 4) * 16, multiplier-independent.

    Greens q=16 (10000 -> 2112), R q=20 (10100 -> 2624), B q=8
    (01000 -> 1088). Chroma reconstruction (value-2048)*2 + green avg:
    R -> 1152 + 2112 = 3264; B -> -1920 + 2112 = 192. Tone points
    (dcraw pt[]): 2112 -> 3162, 3264 -> 7722, 192 -> 202 (derived on
    paper from the segment interpolation + 0.5 rounding).
    """
    bits = (
        "010000" "010000" "010000"          # muls
        + "11111111" + "10000" * 4          # c0 pass0 (rows 0-1 greens)
        + "11111111" + "10000" * 4          # c0 pass1 (rows 2-3 greens)
        + "11111111" + "10100" * 4          # c1 (R at even rows, odd cols)
        + "11111111" + "01000" * 4          # c2 (B at odd rows, even cols)
    )
    bits = bits + "0" * (-len(bits) % 8)
    stream = int(bits, 2).to_bytes(len(bits) // 8, "big")

    import struct
    hdr = bytearray(736)
    hdr[0:4] = b"qktn"
    hdr[544:546] = struct.pack(">H", 4)
    hdr[546:548] = struct.pack(">H", 4)
    p = tmp_path / "hand.qtk"
    p.write_bytes(bytes(hdr) + stream)

    frame = load_raw(p)
    G, R, B = 3162, 7722, 202
    expected = np.array([[G, R, G, R],
                         [B, G, B, G],
                         [G, R, G, R],
                         [B, G, B, G]], np.uint16)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_radc_truncated_fails_cleanly(tmp_path):
    """A stream cut mid-band must not crash; zero-fill decode or a
    clean load error are both acceptable."""
    rng = np.random.default_rng(5)
    qm = rng.integers(0, 32, size=(48, 64))
    p = tmp_path / "t.qtk"
    write_qktn(p, qm)
    data = p.read_bytes()
    q = tmp_path / "trunc.qtk"
    q.write_bytes(data[: 736 + 40])
    try:
        frame = load_raw(q)
        assert frame.cfa.shape == (48, 64)
    except (ValueError, RuntimeError, OSError):
        pass


def test_radc_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    rng = np.random.default_rng(6)
    qm = rng.integers(0, 32, size=(48, 64))
    p = tmp_path / "dev.qtk"
    write_qktn(p, qm)
    out = tmp_path / "dev.jpg"
    process_image(str(p), ProcParams(), output_path=str(out))
    assert out.exists()


def test_qtk100_vs_reference_decoder(tmp_path):
    """QuickTake 100 (qktk): native decode must match an independent
    Python implementation of the published three-stage recurrence on a
    random (fixed-width-code) stream."""
    from util_qtk import write_qtk100

    p = tmp_path / "t.qtk"
    expected = write_qtk100(p, 32, 48, seed=3)
    frame = load_raw(p)
    assert frame.pattern == "GRBG"
    assert frame.white[0] == 0x3FF
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), expected)


def test_qtk100_larger(tmp_path):
    from util_qtk import write_qtk100

    p = tmp_path / "b.qtk"
    expected = write_qtk100(p, 64, 96, seed=4, indicator=30)
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), expected)


def test_dc120_roundtrip(tmp_path):
    from util_radc import write_kdc_dc120

    rng = np.random.default_rng(5)
    rows = rng.integers(0, 256, size=(976, 848), dtype=np.uint8)
    p = tmp_path / "t120.kdc"
    expected = write_kdc_dc120(p, rows)
    frame = load_raw(p)
    assert frame.cfa.shape == (976, 848)
    assert frame.white[0] == 0xFF
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), expected)
