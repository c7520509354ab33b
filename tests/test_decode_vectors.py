"""Hand-constructed bitstream vectors for the native payload codecs.

Every other decoder test round-trips files produced by this repo's own
encoders, which cannot catch a systematic misreading shared by both
sides. The payload bytes here were assembled BY HAND from the format
semantics (dcraw.cc unpackers / the DNG spec), field by field — the
literals below were never produced by the repo's encoders — and the
expected pixel values were derived independently on paper. Each vector
documents its construction so it can be re-derived.

Containers (TIFF wrappers, curve/WB tags) still come from the test
writers — the codecs under test are the *payload* decoders.
"""

import numpy as np

from util_arw import sony_curve, write_arw2
from util_orf import write_orf
from util_pef import write_pef

from art_tpu.io.dngwrite import write_dng
from art_tpu.io.rawfile import load_raw


def test_lj92_hand_vector(tmp_path):
    """2x4, P=16, predictor 1 (dcraw lossless_jpeg_load_raw semantics).

    Hand Huffman table: len-2 codes 00/01/10 = cats 0/1/2, len-3 code
    110 = cat 3 (DHT counts [0,3,1,0...], symbols 0,1,2,3).
    Pixels [[32770,32771,32769,32766],[32764,32766,32767,32765]]:
      (0,0) pred 2^15        diff +2  cat2 "10"+"10"
      (0,1) pred left 32770  diff +1  cat1 "01"+"1"
      (0,2) pred 32771       diff -2  cat2 "10"+"01"   (-2+3=1)
      (0,3) pred 32769       diff -3  cat2 "10"+"00"   (-3+3=0)
      (1,0) pred above 32770 diff -6  cat3 "110"+"001" (-6+7=1)
      (1,1) pred left 32764  diff +2  cat2 "10"+"10"
      (1,2) pred 32766       diff +1  cat1 "01"+"1"
      (1,3) pred 32767       diff -2  cat2 "10"+"01"
    Scan = 10100111 00110001 10001101 00111001 = a7 31 8d 39.
    """
    import struct

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", 16, 2, 4, 1) + bytes([0, 0x11, 0])
    counts = [0] * 16
    counts[1] = 3  # three len-2 codes
    counts[2] = 1  # one len-3 code
    dht = bytes([0x00]) + bytes(counts) + bytes([0, 1, 2, 3])
    sos = bytes([1, 0, 0]) + bytes([1, 0, 0])  # predictor 1
    stream = (b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht)
              + seg(0xDA, sos) + bytes.fromhex("a7318d39") + b"\xff\xd9")

    expected = np.array([[32770, 32771, 32769, 32766],
                         [32764, 32766, 32767, 32765]], np.uint16)
    path = tmp_path / "v.dng"
    write_dng(path, expected, black=0, white=65535, payload=stream)
    frame = load_raw(path)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_orf_hand_vector(tmp_path):
    """2x4 olympus stream (dcraw olympus_load_raw :2684).

    Expected [[100,200,104,208],[150,60,154,56]]. Per pixel the code is
    3 bits (signbit + 2 low), unary high, nbits low bits, with nbits
    from the per-parity carry; derivations (c0/c1/c2 = carry state):
      (0,0) pred 0   resid 100 diff 25  c0=25 high 1  "000"+"01"+"1001"
      (0,1) pred 0   resid 200 diff 50  c0=50 high 3  "000"+"0001"+"0010"
      (0,2) pred 100 resid 4   diff 1   c1=2 -> sign, c0=0
                                                    "100"+"1"+"0000"
      (0,3) pred 200 resid 8   diff 2   c1=4 -> sign, c0=1
                                                    "100"+"1"+"0001"
      (1,0) pred 0   resid 150 low 2 diff 37 high 2 "010"+"001"+"0101"
      (1,1) pred 0   resid 60  diff 15  c0=15 high 0 "000"+"1"+"1111"
      (1,2) pred 150 resid 4   diff 1   c1=3 -> sign, c0=1
                                                    "100"+"1"+"0001"
      (1,3) pred 60  resid -4  diff -1  c1=1 -> sign, c0=1
                                                    "100"+"1"+"0001"
    Packed (zero-padded): 0c 81 29 09 14 54 7e 46 44.
    """
    expected = np.array([[100, 200, 104, 208],
                         [150, 60, 154, 56]], np.uint16)
    payload = b"\x00" * 7 + bytes.fromhex("0c81290914547e4644")
    path = write_orf(tmp_path / "v.orf", expected, payload=payload)
    frame = load_raw(path)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_pef_hand_vector(tmp_path):
    """2x4 Pentax stream (dcraw pentax_load_raw).

    Canonical codes for the shipped category lengths
    (2,3,3,3,3,3,4,5,6,7,8,9,9): cat0="00", cats1-5="010".."110",
    cat6="1110", cat7="11110", cat8="111110"+0? no — len6 value 62,
    cat9=len7 code 126, cat10=len8 code 254, cat11/12=len9 510/511.
    Expected [[1000,1003,999,1006],[500,600,501,597]]:
      (0,0) vpred 0  diff 1000 cat10 "11111110"+1000(10b)
      (0,1) vpred 0  diff 1003 cat10 "11111110"+1003(10b)
      (0,2) pred 1000 diff -1  cat1  "010"+"0"
      (0,3) pred 1003 diff +3  cat2  "011"+"11"
      (1,0) vpred 0  diff 500  cat9  "1111110"+500(9b)
      (1,1) vpred 0  diff 600  cat10 "11111110"+600(10b)
      (1,2) pred 500 diff +1   cat1  "010"+"1"
      (1,3) pred 600 diff -3   cat2  "011"+"00"
    Packed: fe fa 3f be b4 7f ef a7 f4 b0 ac.
    """
    expected = np.array([[1000, 1003, 999, 1006],
                         [500, 600, 501, 597]], np.uint16)
    payload = bytes.fromhex("fefa3fbeb47fefa7f4b0ac")
    write_pef(tmp_path / "v.pef", expected, payload=payload)
    frame = load_raw(tmp_path / "v.pef")
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_arw2_hand_vector(tmp_path):
    """Two 16-byte ARW2 blocks (dcraw sony_arw2_load_raw).

    Block A (even columns of the 32-col span): 128-bit LE accumulator,
    vmax=512 @ idx 2, vmin=16 @ idx 5 -> sh=2 (0x80<<sh <= 496 stops at
    2); fourteen 7-bit deltas 1..14 from bit 30 fill the other pixels in
    index order: value = (delta<<2)+16.
      acc = 0x200 | 16<<11 | 2<<22 | 5<<26 | sum((k+1)<<(30+7k))
      bytes: 00828054403020140c074442b160341c
    Block B (odd columns): constant 100 (vmax=vmin=100, imax=0, imin=1,
    sh=0, zero deltas): bytes 64200304 + zeros.
    Decoded 11-bit values then map through the tag-28688 curve as
    curve[v << 1].
    """
    vals_a = [20, 24, 512, 28, 32, 16, 36, 40, 44, 48, 52, 56, 60, 64,
              68, 72]
    pix = np.zeros((2, 32), np.int64)
    pix[:, 0::2] = np.asarray(vals_a)
    pix[:, 1::2] = 100
    block_a = bytes.fromhex("00828054403020140c074442b160341c")
    block_b = bytes.fromhex("64200304000000000000000000000000")
    payload = (block_a + block_b) * 2  # two rows
    path = tmp_path / "v.arw"
    write_arw2(path, pix, payload=payload)
    frame = load_raw(path)
    curve = sony_curve()
    expected = curve[(pix << 1) & 0xFFF]
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_arw_lossless_hand_vector(tmp_path):
    """One 4x2-pixel tile = LJ92 1x2 with 4 components (the 2x2 Bayer
    quad layout). Hand Huffman: len-2 codes 00/01/10 = cats 0/1/2,
    len-3 110 = cat3, len-4 1110 = cat4. P=14 -> col-0 predictor 8192,
    col-1 predictor = left sample of the same component.
      col0: +2 "10|10"  +1 "01|1"  -1 "01|0"  -4 "110|011"
      col1: +2 "10|10"  -3 "10|00" +1 "01|1"  -8 "1110|0111"
    35 bits -> a6 b3 a8 7c e0 (zero-padded). Quad blit puts comps
    (0,1;2,3) at rows (0,1) x cols (2k, 2k+1).
    """
    import struct

    from util_arw import write_arw_lossless

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", 14, 1, 2, 4) + bytes(
        b for c in range(4) for b in (c, 0x11, 0))
    counts = [0] * 16
    counts[1] = 3  # len-2: cats 0,1,2
    counts[2] = 1  # len-3: cat 3
    counts[3] = 1  # len-4: cat 4
    dht = bytes([0x00]) + bytes(counts) + bytes([0, 1, 2, 3, 4])
    sos = bytes([4, 0, 0, 1, 0, 2, 0, 3, 0]) + bytes([1, 0, 0])
    stream = (b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht)
              + seg(0xDA, sos) + bytes.fromhex("a6b3a87ce0") + b"\xff\xd9")

    expected = np.array([[8194, 8193, 8196, 8190],
                         [8191, 8188, 8192, 8180]], np.uint16)
    p = tmp_path / "v.arw"
    write_arw_lossless(p, expected.astype(np.int64), tile=(4, 2),
                       payloads=[stream])
    frame = load_raw(p)
    assert frame.pattern == "RGGB"
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_x3f_true_hand_vector(tmp_path):
    """TRUE-engine plane stream, 2x4, all three planes identical.

    Category prefix table from the section header: 4-bit code i ->
    category i. Predictors: cols 0-1 vertical per row parity (init 512),
    cols >=2 horizontal per column parity.
      (0,0) +2 "0010|10"  (0,1) -2 "0010|01"  (0,2) +2 "0010|10"
      (0,3) +1 "0001|1"   (1,0)  0 "0000"     (1,1) +1 "0001|1"
      (1,2) +3 "0010|11"  (1,3) +1 "0001|1"
    43 bits -> 28 92 86 03 2c 60 (zero-padded).
    """
    import struct

    from util_x3f import write_x3f

    vals = np.array([[514, 510, 516, 511],
                     [512, 513, 515, 514]], np.uint16)
    plane = bytes.fromhex("289286032c60")
    head = bytearray(8)
    for i in range(13):
        head += bytes([4, i << 4])
    head += b"\0\0"
    for _ in range(3):
        head += struct.pack("<I", len(plane))
    payload = bytearray(head)
    for _ in range(3):
        payload += plane
        while len(payload) % 16:
            payload.append(0)

    rgb = np.stack([vals] * 3)
    p = tmp_path / "v.x3f"
    write_x3f(p, rgb, fmt=30, payload=bytes(payload))
    frame = load_raw(p)
    assert frame.cfa.shape == (3, 2, 4)
    for c in range(3):
        np.testing.assert_array_equal(frame.cfa[c].astype(np.uint16), vals)


def test_dcr_escape_block_hand_vector(tmp_path):
    """Kodak 65000 absolute-value escape block (dcraw kodak_65000_decode
    rewind path) — the compressed round-trips never reach it.

    First nibble byte 0x0D (len 13 > 12) triggers the escape; the
    decoder rewinds and reads six u16s [0x100D, 0x2001, 0x3002, 0x4003,
    0x5004, 0x6005]:
      out[0] = 1<<8 | 3<<4 | 5 = 309   (top nibbles of words 0,2,4)
      out[1] = 2<<8 | 4<<4 | 6 = 582   (top nibbles of words 1,3,5)
      out[2..7] = low 12 bits = 13,1,2,3,4,5
    Escape values are absolute (no predictor), mapped through the
    identity curve.
    """
    from util_dcr import write_dcr

    stream = bytes.fromhex("0d1001200230034004500560")
    idx = np.zeros((1, 8), np.int64)  # dims only; stream is overridden
    p = tmp_path / "v.dcr"
    write_dcr(p, idx, stream=stream)
    frame = load_raw(p)
    expected = np.array([[309, 582, 13, 1, 2, 3, 4, 5]], np.uint16)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
