"""Synthetic Samsung SRW writer — test oracle for the native SRW decoder.

Builds an SRW: TIFF whose IFD0 is the raw image (compression 32770 /
32772 / 32773), an EXIF IFD carrying ISO and a bare-IFD Samsung
MakerNote (value offsets relative to the note start) with the WB levels
(0xa021) and subtract offsets (0xa028), plus the variant payload
(reference behavior: dcraw.cc samsung_load_raw / samsung2_load_raw /
samsung3_load_raw)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_nef import _BitWriter
from tests.util_pef import _build_ifd


class _WordBitWriter:
    """MSB-first bits packed into little-endian 32-bit words (the
    ph1-style bit source the v0/v3 streams use)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (int(value) & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 32:
            word = (self.acc >> (self.n - 32)) & 0xFFFFFFFF
            self.out += struct.pack("<I", word)
            self.n -= 32
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            word = (self.acc << (32 - self.n)) & 0xFFFFFFFF
            self.out += struct.pack("<I", word)
            self.n = 0
        return bytes(self.out)


_L = 13  # fixed code length used by the simple encoders (fits +/-4095)


def _encode_v0(mosaic):
    """v0 rows: dir=0, explicit len reload on the first block, 16-pixel
    blocks predicting from the previous block's last even/odd pixel
    (128 on the first block). Returns (offset table, payload)."""
    h, w = mosaic.shape
    assert w % 16 == 0 and h % 2 == 0
    # the decoder un-interleaves with a pairwise swap; pre-swap so the
    # decoded result equals `mosaic`
    st = mosaic.astype(np.int64).copy()
    for row in range(0, h - 1, 2):
        for col in range(0, w - 1, 2):
            st[row, col + 1], st[row + 1, col] = \
                st[row + 1, col], st[row, col + 1]
    offsets = []
    payload = bytearray()
    for row in range(h):
        offsets.append(len(payload))
        bw = _WordBitWriter()
        for col in range(0, w, 16):
            bw.put(0, 1)                      # dir = horizontal
            for _ in range(4):
                if col == 0:
                    bw.put(3, 2)              # opcode: explicit reload
                    bw.put(_L, 4)
                else:
                    bw.put(0, 2)              # keep length
            for pix in range(16):             # even pass then odd pass
                c = (pix * 2) if pix < 8 else (pix - 8) * 2 + 1
                if col == 0:
                    pred = 128
                else:
                    pred = st[row, col - 2 + (c & 1)]
                diff = int(st[row, col + c] - pred)
                assert -(1 << (_L - 1)) <= diff < (1 << (_L - 1))
                bw.put(diff, _L)
        payload += bw.flush()
    return offsets, bytes(payload)


# v2 fixed huffman table: (code length << 8) | category, LUT-filled in
# listed order, so codes are canonical prefixes in that same order
_V2_TAB = (0x304, 0x307, 0x206, 0x205, 0x403, 0x600, 0x709,
           0x80a, 0x90b, 0xa0c, 0xa0d, 0x501, 0x408, 0x402)


def _v2_codes():
    """category -> (code length, code), from the 10-bit LUT layout."""
    out = {}
    pos = 0
    for entry in _V2_TAB:
        ln = entry >> 8
        out[entry & 0xFF] = (ln, pos >> (10 - ln))
        pos += 1024 >> ln
    assert pos == 1024
    return out


def _encode_v2(mosaic, bps=12):
    codes = _v2_codes()
    img = mosaic.astype(np.int64)
    h, w = mosaic.shape
    vpred = np.zeros((2, 2), dtype=np.int64)
    hpred = np.zeros(2, dtype=np.int64)
    bw = _BitWriter()
    for row in range(h):
        for col in range(w):
            if col < 2:
                pred = vpred[row & 1, col]
            else:
                pred = hpred[col & 1]
            diff = int(img[row, col] - pred)
            if col < 2:
                vpred[row & 1, col] = img[row, col]
            hpred[col & 1] = img[row, col]
            mag = -diff if diff < 0 else diff
            cat = mag.bit_length()
            ln, code = codes[cat]
            bw.put(code, ln)
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.put(v, cat)
    return bw.flush()


def _encode_v3(mosaic, init=2048):
    """v3 with opt=7: no magnitude codes (mag stays 0), a pmode bit per
    block (always 0 -> horizontal mode 7), explicit len reloads, rows on
    16-byte-aligned boundaries after a 14-byte header."""
    h, w = mosaic.shape
    assert w % 16 == 0
    st = mosaic.astype(np.int64)
    payload = bytearray(b"\x00" * 9 + bytes([7])      # opt = 7
                        + struct.pack("<HH", 0, init))
    for row in range(h):
        pad = (0 - len(payload)) & 15
        payload += b"\x00" * pad
        bw = _WordBitWriter()
        for tab in range(0, w, 16):
            bw.put(0, 1)                     # pmode bit -> mode 7
            for _ in range(4):
                bw.put(3, 2)                 # len code: explicit
            for _ in range(4):
                bw.put(_L, 4)
            for c in range(16):
                col = tab + ((((c & 7) << 1) ^ (c >> 3)) ^ (row & 1))
                pred = init if tab == 0 else st[row, tab - 2 + (col & 1)]
                diff = int(st[row, col] - pred)
                assert -(1 << (_L - 1)) <= diff < (1 << (_L - 1))
                bw.put(diff, _L)
        payload += bw.flush()
    return bytes(payload)


_PAT_BYTES = {"RGGB": bytes((0, 1, 1, 2)), "GRBG": bytes((1, 0, 2, 1)),
              "GBRG": bytes((1, 2, 0, 1)), "BGGR": bytes((2, 1, 1, 0))}


def write_srw(path, mosaic, variant=3, bps=12, make="SAMSUNG",
              model="SYNTH NX", iso=200,
              wb_rg1g2b=(8192, 4096, 4096, 6144),
              wb_sub=(0, 0, 0, 0), pattern="RGGB", payload=None,
              row_offsets=None):
    """variant: 0, 2 or 3 (compression 32770/32772/32773). payload /
    row_offsets: raw stream overrides for hand-built vectors."""
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    assert mosaic.max() < (1 << bps)
    comp = {0: 32770, 2: 32772, 3: 32773}[variant]
    if payload is None:
        if variant == 0:
            row_offsets, payload = _encode_v0(mosaic)
        elif variant == 2:
            payload = _encode_v2(mosaic, bps)
        else:
            payload = _encode_v3(mosaic)

    def u16s(*v):
        return b"".join(struct.pack("<H", int(x)) for x in v)

    def u32s(*v):
        return b"".join(struct.pack("<I", int(x)) for x in v)

    # --- MakerNote: bare IFD at the note start, offsets note-relative ---
    mn_ifd_sz = 2 + 2 * 12 + 4
    wb_off = mn_ifd_sz
    sub_off = wb_off + 16
    mn_ifd = _build_ifd([
        (0xa021, 4, 4, ("off", wb_off)),
        (0xa028, 4, 4, ("off", sub_off)),
    ])
    makernote = mn_ifd + u32s(*wb_rg1g2b) + u32s(*wb_sub)

    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"

    def sz(n):
        return 2 + n * 12 + 4

    n0 = 10 + (1 if variant == 0 else 0)
    ifd0_off = 8
    ifd0_sz = sz(n0)
    exif_off = ifd0_off + ifd0_sz
    exif_sz = sz(2)
    heap_off = exif_off + exif_sz
    heap = bytearray()

    def put(b):
        off = heap_off + len(heap)
        heap.extend(b)
        return off

    make_off = put(make_b)
    model_off = put(model_b)
    mn_off = put(makernote)
    table_off = None
    if variant == 0:
        table_off = put(b"".join(u32s(o) for o in row_offsets))
    strip_off = heap_off + len(heap)

    entries = [
        (256, 4, 1, u32s(w)),
        (257, 4, 1, u32s(h)),
        (258, 3, 1, u16s(bps)),
        (259, 3, 1, u16s(comp)),
        (271, 2, len(make_b), ("off", make_off)),
        (272, 2, len(model_b), ("off", model_off)),
        (273, 4, 1, u32s(strip_off)),
        (274, 3, 1, u16s(1)),
        (33422, 1, 4, _PAT_BYTES[pattern]),
        (34665, 4, 1, ("off", exif_off)),
    ]
    if variant == 0:
        entries.append((40976, 4, 1, u32s(table_off)))
    ifd0 = _build_ifd(entries)
    exif_ifd = _build_ifd([
        (34855, 3, 1, u16s(iso)),
        (0x927C, 7, len(makernote), ("off", mn_off)),
    ])
    out = (struct.pack("<2sHI", b"II", 42, ifd0_off)
           + ifd0 + exif_ifd + heap + payload)
    with open(path, "wb") as f:
        f.write(out)
