"""Synthetic Panasonic RW2 writer (test oracle for the native decoder).

Encodes the RW2 container (TIFF magic 85, tag-280 data offset) with the
legacy predictive bitstream, v5 byte-blocks, cs6 sliced pages, or cs7
byte-blocks, per the public format descriptions (reference behavior:
rtengine/panasonic_decoders.cc).
"""

from __future__ import annotations

import struct

import numpy as np

LOAD_FLAGS = 0x2008


def _rotate_to_file(buf: bytearray) -> bytes:
    """Inverse of the decoder's 16KB page rotation: working buffer
    buf[load_flags:] holds the chunk's first file bytes."""
    assert len(buf) % 0x4000 == 0
    out = bytearray()
    for p in range(0, len(buf), 0x4000):
        page = buf[p : p + 0x4000]
        out += page[LOAD_FLAGS:] + page[:LOAD_FLAGS]
    return bytes(out)


class _LegacyBitWriter:
    """Mirror of the legacy reader: bit positions descend from the top of
    each 128-Kbit page; byte index is XOR-complemented per 16-byte group."""

    def __init__(self):
        self.pages = [bytearray(0x4000)]
        self.vbits = 0

    def put(self, val, nbits):
        if self.vbits == 0:
            if any(self.pages[-1]):
                self.pages.append(bytearray(0x4000))
            buf = self.pages[-1]
        buf = self.pages[-1]
        self.vbits = (self.vbits - nbits) & 0x1FFFF
        byte = (self.vbits >> 3) ^ 0x3FF0
        acc = buf[byte] | (buf[byte + 1] << 8) if byte + 1 < 0x4000 \
            else buf[byte]
        acc |= (int(val) & ((1 << nbits) - 1)) << (self.vbits & 7)
        buf[byte] = acc & 0xFF
        if byte + 1 < 0x4000:
            buf[byte + 1] = (acc >> 8) & 0xFF

    def payload(self):
        return _rotate_to_file(bytearray(b"".join(self.pages)))


def encode_legacy(pix):
    """Predictive 12-bit stream. Pixel values must be in [16, 4095] and
    successive same-parity values within each 14-column group must differ
    by at most 127 (sh=0 deltas)."""
    h, w = pix.shape
    bw = _LegacyBitWriter()
    for row in range(h):
        pred = [0, 0]
        nonz = [0, 0]
        for col in range(w):
            i = col % 14
            if i == 0:
                pred = [0, 0]
                nonz = [0, 0]
            if i % 3 == 2:
                bw.put(0, 2)  # sh code 0 -> sh = 4 >> 3 = 0
            t = int(pix[row, col])
            p = i & 1
            if nonz[p]:
                if t == pred[p]:
                    bw.put(0, 8)
                else:
                    j = t - (pred[p] - 0x80)
                    assert 1 <= j <= 255, (t, pred[p])
                    bw.put(j, 8)
                    pred[p] = t
            else:
                assert t >= 16, "first-of-parity needs a nonzero high byte"
                nonz[p] = t >> 4
                bw.put(t >> 4, 8)
                bw.put(t & 0xF, 4)
                pred[p] = (t >> 4 << 4) | (t & 0xF)
    return bw.payload()


def encode_v5(pix, bpp=12):
    """v5: 16-byte blocks of 10 (12-bit) / 9 (14-bit) packed pixels,
    through the same page rotation (sequential byte order)."""
    h, w = pix.shape
    blk = 10 if bpp == 12 else 9
    assert w % blk == 0
    stream = bytearray()
    for row in range(h):
        for col in range(0, w, blk):
            v = [int(x) for x in pix[row, col : col + blk]]
            b = bytearray(16)
            if bpp == 12:
                for k in range(5):
                    a, c = v[2 * k], v[2 * k + 1]
                    b[3 * k] = a & 0xFF
                    b[3 * k + 1] = ((a >> 8) & 0xF) | ((c & 0xF) << 4)
                    b[3 * k + 2] = c >> 4
            else:
                b[0] = v[0] & 0xFF
                b[1] = ((v[0] >> 8) & 0x3F) | ((v[1] & 3) << 6)
                b[2] = (v[1] >> 2) & 0xFF
                b[3] = ((v[1] >> 10) & 0xF) | ((v[2] & 0xF) << 4)
                b[4] = (v[2] >> 4) & 0xFF
                b[5] = ((v[2] >> 12) & 3) | ((v[3] & 0x3F) << 2)
                b[6] = (v[3] >> 6) & 0xFF
                b[7] = v[4] & 0xFF
                b[8] = ((v[4] >> 8) & 0x3F) | ((v[5] & 3) << 6)
                b[9] = (v[5] >> 2) & 0xFF
                b[10] = ((v[5] >> 10) & 0xF) | ((v[6] & 0xF) << 4)
                b[11] = (v[6] >> 4) & 0xFF
                b[12] = ((v[6] >> 12) & 3) | ((v[7] & 0x3F) << 2)
                b[13] = (v[7] >> 6) & 0xFF
                b[14] = v[8] & 0xFF
                b[15] = (v[8] >> 8) & 0x3F
            stream += b
    pad = (-len(stream)) % 0x4000
    stream += bytes(pad)
    return _rotate_to_file(bytearray(stream))


def _cs6_pack(pb):
    """Inverse of the cs6 page bit-slicing: 14 symbols -> 16 bytes."""
    w = [0] * 16
    w[0] = (pb[0] >> 6) & 0xFF
    w[1] = ((pb[0] & 0x3F) << 2) | ((pb[1] >> 12) & 0x3)
    w[2] = (pb[1] >> 4) & 0xFF
    w[3] = ((pb[1] & 0xF) << 4) | ((pb[2] & 0x3) << 2) | ((pb[3] >> 8) & 0x3)
    w[4] = pb[3] & 0xFF
    w[5] = (pb[4] >> 2) & 0xFF
    w[6] = ((pb[4] & 0x3) << 6) | ((pb[5] >> 4) & 0x3F)
    w[7] = ((pb[5] & 0xF) << 4) | ((pb[6] & 0x3) << 2) | ((pb[7] >> 8) & 0x3)
    w[8] = pb[7] & 0xFF
    w[9] = (pb[8] >> 2) & 0xFF
    w[10] = ((pb[8] & 0x3) << 6) | ((pb[9] >> 4) & 0x3F)
    w[11] = ((pb[9] & 0xF) << 4) | ((pb[10] & 0x3) << 2) \
        | ((pb[11] >> 8) & 0x3)
    w[12] = pb[11] & 0xFF
    w[13] = (pb[12] >> 2) & 0xFF
    w[14] = ((pb[12] & 0x3) << 6) | ((pb[13] >> 4) & 0x3F)
    w[15] = (pb[13] & 0xF) << 4
    return bytes(w[15 - i] for i in range(16))


def encode_cs6(pix):
    """cs6 blocks with base code 3 (multiplier 16) everywhere.

    Encodable values: pixels 0/1 of each 11-block are raw 14-bit fields
    (value + 0xf <= 0x3fff); pixels 2..10 need (value + 0xf) % 16 == 0
    and (value + 0xf) / 16 <= 0x3ff."""
    h, w = pix.shape
    assert w % 11 == 0 and h % 16 == 0
    stream = bytearray()
    for row in range(h):
        for col in range(0, w, 11):
            v = [int(x) for x in pix[row, col : col + 11]]
            pb = []
            for k, val in enumerate(v):
                if k % 3 == 2:
                    pb.append(3)  # base 4, pmul 16, pixel_base 0x2000
                e = val + 0xF
                if k < 2:
                    assert e <= 0x3FFF
                    pb.append(e)
                else:
                    assert e % 16 == 0 and e // 16 <= 0x3FF, val
                    pb.append(e // 16)
            assert len(pb) == 14
            stream += _cs6_pack(pb)
    return bytes(stream)


def encode_cs7(pix, bpp=14):
    """cs7: plain sequential 16-byte blocks (no page rotation)."""
    h, w = pix.shape
    blk = 9 if bpp == 14 else 10
    assert w % blk == 0 and h % 16 == 0
    stream = bytearray()
    for row in range(h):
        for col in range(0, w, blk):
            v = [int(x) for x in pix[row, col : col + blk]]
            b = bytearray(16)
            if bpp == 14:
                b[0] = v[0] & 0xFF
                b[1] = ((v[0] >> 8) & 0x3F) | ((v[1] & 3) << 6)
                b[2] = (v[1] >> 2) & 0xFF
                b[3] = ((v[1] >> 10) & 0xF) | ((v[2] & 0xF) << 4)
                b[4] = (v[2] >> 4) & 0xFF
                b[5] = ((v[2] >> 12) & 3) | ((v[3] & 0x3F) << 2)
                b[6] = (v[3] >> 6) & 0xFF
                b[7] = v[4] & 0xFF
                b[8] = ((v[4] >> 8) & 0x3F) | ((v[5] & 3) << 6)
                b[9] = (v[5] >> 2) & 0xFF
                b[10] = ((v[5] >> 10) & 0xF) | ((v[6] & 0xF) << 4)
                b[11] = (v[6] >> 4) & 0xFF
                b[12] = ((v[6] >> 12) & 3) | ((v[7] & 0x3F) << 2)
                b[13] = (v[7] >> 6) & 0xFF
                b[14] = v[8] & 0xFF
                b[15] = (v[8] >> 8) & 0x3F
            else:
                for k in range(5):
                    a, c = v[2 * k], v[2 * k + 1]
                    b[3 * k] = a & 0xFF
                    b[3 * k + 1] = ((a >> 8) & 0xF) | ((c & 0xF) << 4)
                    b[3 * k + 2] = c >> 4
            stream += b
    return bytes(stream)


def write_rw2(path, pix, encoding=7, bpp=None,
              wb_rgb=(520, 256, 410), blacks=(143, 142, 141),
              borders=None, cfa=1, make="Panasonic", model="TEST-1",
              iso=200):
    """Write a minimal RW2: IFD0 with the Panasonic tag set + payload."""
    h, w = pix.shape
    if bpp is None:
        bpp = 12 if encoding in (0, 6) else 14
    if encoding == 0:
        payload = encode_legacy(pix)
    elif encoding == 5:
        payload = encode_v5(pix, bpp)
    elif encoding == 6:
        payload = encode_cs6(pix)
    elif encoding == 7:
        payload = encode_cs7(pix, bpp)
    else:
        raise ValueError(encoding)

    entries = []

    def add(tag, typ, vals):
        packed = b"".join(
            struct.pack("<" + {1: "B", 3: "H", 4: "I"}[typ], int(v))
            for v in vals)
        entries.append((tag, typ, len(vals), packed))

    def add_str(tag, s):
        entries.append((tag, 2, len(s) + 1, s.encode() + b"\0"))

    add(1, 4, [1])           # pana_raw marker
    add(2, 3, [w])
    add(3, 3, [h])
    if borders:
        top, left, bot, right = borders
        add(4, 3, [top])
        add(5, 3, [left])
        add(6, 3, [bot])
        add(7, 3, [right])
    add(9, 3, [cfa])
    add(10, 3, [bpp])
    add(23, 3, [iso])
    add(28, 3, [blacks[0]])
    add(29, 3, [blacks[1]])
    add(30, 3, [blacks[2]])
    add(36, 3, [wb_rgb[0]])
    add(37, 3, [wb_rgb[1]])
    add(38, 3, [wb_rgb[2]])
    if encoding:
        add(45, 3, [encoding])
    add_str(271, make)
    add_str(272, model)
    add(274, 3, [1])
    add(280, 4, [0])  # patched below

    entries.sort()
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    blobs = bytearray()
    fields = []
    for tag, typ, count, packed in entries:
        if len(packed) <= 4:
            fields.append((tag, typ, count,
                           packed + b"\0" * (4 - len(packed))))
        else:
            fields.append((tag, typ, count,
                           struct.pack("<I", data_off + len(blobs))))
            blobs += packed
    strip_off = data_off + len(blobs)
    out = bytearray(struct.pack("<2sHI", b"II", 85, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, field in fields:
        if tag == 280:
            field = struct.pack("<I", strip_off)
        out += struct.pack("<HHI", tag, typ, count) + field
    out += struct.pack("<I", 0)
    out += blobs
    out += payload
    with open(path, "wb") as f:
        f.write(out)
