"""Synthetic Nikon NEF writer — test oracle for the native NEF decoder.

Builds a lossless type-2 NEF: TIFF with a SubIFD raw image (compression
34713), a Nikon MakerNote carrying the linearization-table header
(version 0x46, initial predictors) and the classic WB rationals, and the
huffman bitstream of left/above-predicted differences using the 12-bit
or 14-bit lossless code table."""

from __future__ import annotations

import struct

import numpy as np

# lossless code tables (format constants; counts per code length + symbols)
_TREE_12 = ((0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0),
            (5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12))
_TREE_14 = ((0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0),
            (7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14))


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.out)


def _encode_stream(mosaic, bps):
    counts, symbols = _TREE_12 if bps == 12 else _TREE_14
    codes = _canonical_codes(counts, symbols)
    h, w = mosaic.shape
    default = 1 << (bps - 1)
    vpred = np.full((2, 2), default, dtype=np.int64)
    bw = _BitWriter()
    img = mosaic.astype(np.int64)
    for row in range(h):
        for col in range(w):
            if col < 2:
                pred = vpred[row & 1, col]
            else:
                pred = img[row, col - 2]
            diff = int(img[row, col] - pred) & 0xFFFF
            if diff >= 0x8000:
                diff -= 0x10000
            if col < 2:
                vpred[row & 1, col] = img[row, col]
            mag = -diff if diff < 0 else diff
            length = mag.bit_length()
            if length not in codes:
                raise ValueError(f"diff {diff} needs len {length}")
            lcode, code = codes[length]
            bw.put(code, lcode)
            if length:
                v = diff if diff >= 0 else diff + (1 << length) - 1
                bw.put(v, length)
    return bw.flush()


def write_nef(path, mosaic, bps=14, make="NIKON CORPORATION",
              model="SYNTH Z", iso=400, wb_rbgg=(2.0, 1.5, 1.0, 1.0)):
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    assert mosaic.max() < (1 << bps)
    payload = _encode_stream(mosaic, bps)

    def u16s(*v):
        return b"".join(struct.pack("<H", int(x)) for x in v)

    def u32s(*v):
        return b"".join(struct.pack("<I", int(x)) for x in v)

    def rat(v):
        return struct.pack("<II", int(v * 1000), 1000)

    # --- Nikon MakerNote: "Nikon" header + embedded TIFF ---
    # lin table (tag 0x96): ver 0x46 0x30, vpred[2][2], csize=0
    lt = bytes([0x46, 0x30]) + u16s(1 << (bps - 1), 1 << (bps - 1),
                                    1 << (bps - 1), 1 << (bps - 1), 0)
    wb = b"".join(rat(v) for v in wb_rbgg)  # R, B, G1, G2

    def build_ifd(entries, next_off=0):
        body = struct.pack("<H", len(entries))
        for tag, typ, count, vb in sorted(entries, key=lambda e: e[0]):
            if isinstance(vb, tuple):
                body += struct.pack("<HHII", tag, typ, count, vb[1])
            else:
                body += struct.pack("<HHI", tag, typ, count) + vb.ljust(
                    4, b"\x00")
        body += struct.pack("<I", next_off)
        return body

    # embedded TIFF: header(8) + IFD + values
    mn_ifd_sz = 2 + 2 * 12 + 4
    lt_off = 8 + mn_ifd_sz
    wb_off = lt_off + len(lt)
    mn_ifd = build_ifd([
        (0x96, 7, len(lt), ("off", lt_off)),
        (0x0C, 5, 4, ("off", wb_off)),
    ])
    mn_tiff = struct.pack("<2sHI", b"II", 42, 8) + mn_ifd + lt + wb
    makernote = b"Nikon\x00\x02\x10\x00\x00" + mn_tiff

    # --- main TIFF: IFD0 -> SubIFD (raw) + EXIF ---
    base = 8
    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"

    def sz(entries):
        return 2 + len(entries) * 12 + 4

    ifd0_entries = 4  # make, model, orientation, subifd; exif ptr = 5
    ifd0_sz = sz(range(5))
    exif_sz = sz(range(2))
    raw_sz = sz(range(6))
    ifd0_off = base
    exif_off = ifd0_off + ifd0_sz
    raw_off = exif_off + exif_sz
    heap_off = raw_off + raw_sz
    heap = bytearray()

    def put(b):
        off = heap_off + len(heap)
        heap.extend(b)
        return off

    make_off = put(make_b)
    model_off = put(model_b)
    mn_off = put(makernote)
    strip_off = heap_off + len(heap)

    ifd0 = build_ifd([
        (271, 2, len(make_b), ("off", make_off)),
        (272, 2, len(model_b), ("off", model_off)),
        (274, 3, 1, u16s(1)),
        (330, 4, 1, u32s(raw_off)),
        (34665, 4, 1, ("off", exif_off)),
    ])
    exif_ifd = build_ifd([
        (34855, 3, 1, u16s(iso)),
        (0x927C, 7, len(makernote), ("off", mn_off)),
    ])
    raw_ifd = build_ifd([
        (256, 4, 1, u32s(w)),
        (257, 4, 1, u32s(h)),
        (258, 3, 1, u16s(bps)),
        (259, 3, 1, u16s(34713)),
        (273, 4, 1, u32s(strip_off)),
        (279, 4, 1, u32s(len(payload))),
    ])
    out = (struct.pack("<2sHI", b"II", 42, ifd0_off)
           + ifd0 + exif_ifd + raw_ifd + heap + payload)
    with open(path, "wb") as f:
        f.write(out)
