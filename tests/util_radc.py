"""Synthetic Kodak RADC writer (test oracle for the native decoder).

Builds literal-only RADC streams (every column pair coded through the
table-18 quantized-literal path, so the decoded mosaic is independent
of the per-band multipliers and has a closed-form NumPy model), wraps
them in the three containers the decoder dispatches on (KDC TIFF with
Kodak make/model, Apple "qktn", Logitech "PXN"), and computes the
expected decoded mosaic including the chroma reconstruction and the
fixed 12->14-bit tone curve (dcraw.cc kodak_radc_load_raw :2830).
"""

from __future__ import annotations

import struct

import numpy as np

# (length, value) pairs per table in canonical order — the format's
# fixed camera-side constants (see artraw.cc kRadcPairs)
_TREES = [
    [(1, 1), (2, 3), (3, 4), (4, 2), (5, 7), (6, 5), (7, 6), (7, 8)],
    [(1, 0), (2, 1), (3, 3), (4, 4), (5, 2), (6, 7), (7, 6), (8, 5),
     (8, 8)],
    [(2, 1), (2, 3), (3, 0), (3, 2), (3, 4), (4, 6), (5, 5), (6, 7),
     (6, 8)],
    [(2, 0), (2, 1), (2, 3), (3, 2), (4, 4), (5, 6), (6, 7), (7, 5),
     (7, 8)],
    [(2, 1), (2, 4), (3, 0), (3, 2), (3, 3), (4, 7), (5, 5), (6, 6),
     (6, 8)],
    [(2, 3), (3, 1), (3, 2), (3, 4), (3, 5), (3, 6), (4, 7), (5, 0),
     (5, 8)],
    [(2, 3), (2, 6), (3, 0), (3, 1), (4, 4), (4, 5), (4, 7), (5, 2),
     (5, 8)],
    [(2, 4), (2, 7), (3, 3), (3, 6), (4, 1), (4, 2), (4, 5), (5, 0),
     (5, 8)],
    [(2, 6), (3, 1), (3, 3), (3, 5), (3, 7), (3, 8), (4, 0), (5, 2),
     (5, 4)],
    [(2, 0), (2, 1), (3, 2), (3, 3), (4, 4), (4, 5), (5, 6), (5, 7),
     (4, 8)],
]


def _codes(pairs):
    """Slot-filling code assignment (each pair claims the next
    256>>len slots of the 8-bit lookahead): value -> (code, length).
    Not canonical-by-length — table 9 lists a length-4 code after its
    length-5 codes."""
    out = {}
    slot = 0
    for ln, val in pairs:
        out[val] = (slot >> (8 - ln), ln)
        slot += 256 >> ln
    assert slot <= 256
    return out

_TREE_CODES = [_codes(p) for p in _TREES]


class BitWriter:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def bytes(self):
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def encode_radc_stream(qm, muls=None, s=3):
    """qm: (H, W) literal indices (8-s bits each); every pixel is
    emitted through the quantized-literal path (pixel code =
    (q<<s | 1<<(s-1)) * 16). s=2 is the cbpp-243 (DC50-class)
    quantizer. muls: optional (H//4, 3) per-band multipliers (1..63)."""
    qm = np.asarray(qm)
    h, w = qm.shape
    assert h % 4 == 0 and w % 2 == 0 and qm.max() < (1 << (8 - s))
    half = w // 2
    nb = h // 4
    if muls is None:
        muls = 16 + (np.arange(nb * 3).reshape(nb, 3) % 40)
    bw = BitWriter()
    for b in range(nb):
        row = 4 * b
        for c in range(3):
            bw.put(int(muls[b][c]), 6)
        for c in range(3):
            for p in range(2 if c == 0 else 1):
                ctx = 1
                col = half
                while col > 0:
                    code, ln = _TREE_CODES[ctx][8]
                    bw.put(code, ln)
                    ctx = 8
                    col -= 2
                    for y in (1, 2):
                        for x in (col + 1, col):
                            if c == 0:
                                r_, c_ = row + 2 * p + (y - 1), \
                                    2 * x + (y - 1)
                            else:
                                r_, c_ = row + 2 * (y - 1) + c - 1, \
                                    2 * x + 2 - c
                            bw.put(int(qm[r_, c_]), 8 - s)
    return bw.bytes()


def radc_curve():
    pts = [(0, 0), (1280, 1344), (2320, 3616), (3328, 8000),
           (4095, 16383), (65535, 16383)]
    curve = np.zeros(0x10000, dtype=np.uint16)
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        xs = np.arange(x0, x1 + 1)
        curve[x0:x1 + 1] = ((xs - x0) / (x1 - x0) * (y1 - y0)
                            + y0 + 0.5).astype(np.uint16)
    return curve


def radc_expected(qm, s=3):
    """Expected decoded mosaic for a literal-only stream."""
    qm = np.asarray(qm).astype(np.int64)
    h, w = qm.shape
    m = (qm * (1 << s) + (1 << (s - 1))) * 16  # mul cancels exactly
    # chroma reconstruction at (x+y)-odd positions; the left/right taps
    # land on (x+y)-even green pixels, which the pass never modifies
    left = np.empty_like(m)
    left[:, 1:] = m[:, :-1]
    left[:, 0] = m[:, 1]
    right = np.empty_like(m)
    right[:, :-1] = m[:, 1:]
    right[:, -1] = m[:, -2]
    v = np.clip((m - 2048) * 2 + (left + right) // 2, 0, 0xFFFF)
    odd = ((np.arange(w)[None, :] + np.arange(h)[:, None]) & 1) == 1
    out = np.where(odd, v, m)
    return radc_curve()[out]


def write_kdc_radc(path, qm, model="40", cbpp=0):
    """Minimal KDC: LE TIFF, make KODAK, RADC stream at the fixed
    offset (1152 for DC40, 19712 for DC50-class models)."""
    qm = np.asarray(qm)
    assert qm.shape == (512, 768), "KDC geometry is fixed 768x512"
    stream = encode_radc_stream(qm, s=2 if cbpp == 243 else 3)
    data_off = 19712 if "DC50" in model else 1152

    mk = b"KODAK\0"
    md = model.encode() + b"\0"
    blocks = bytearray()

    def block(data):
        off = 8 + len(blocks)
        blocks.extend(data)
        if len(blocks) & 1:
            blocks.append(0)
        return off

    entries = []

    def entry(tag, type_, count, value):
        entries.append(struct.pack("<HHII", tag, type_, count, value))

    def ascii_entry(tag, data):
        # TIFF stores values of <=4 bytes inline in the value field
        if len(data) <= 4:
            entries.append(struct.pack("<HHI", tag, 2, len(data))
                           + data.ljust(4, b"\0"))
        else:
            entry(tag, 2, len(data), block(data))

    entry(256, 3, 1, 768)
    entry(257, 3, 1, 512)
    ascii_entry(271, mk)
    ascii_entry(272, md)
    if cbpp:
        entry(37122, 4, 1, cbpp)

    assert 8 + len(blocks) <= data_off
    pad = data_off - 8 - len(blocks)
    payload = bytes(blocks) + b"\0" * pad + stream
    ifd_off = 8 + len(payload) + (len(payload) & 1)
    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", ifd_off))
        f.write(payload)
        if len(payload) & 1:
            f.write(b"\0")
        f.write(struct.pack("<H", len(entries)))
        f.write(b"".join(entries))
        f.write(struct.pack("<I", 0))
    return radc_expected(qm, s=2 if cbpp == 243 else 3)


def write_qktn(path, qm, indicator=0):
    """Apple QuickTake 150 container: 'qktn' magic, BE dims at 544,
    stream at 736 (indicator 30 at 552 selects 738)."""
    qm = np.asarray(qm)
    h, w = qm.shape
    stream = encode_radc_stream(qm)
    off = 738 if indicator == 30 else 736
    hdr = bytearray(off)
    hdr[0:4] = b"qktn"
    hdr[544:546] = struct.pack(">H", h)
    hdr[546:548] = struct.pack(">H", w)
    hdr[552:554] = struct.pack(">H", indicator)
    with open(path, "wb") as f:
        f.write(bytes(hdr) + stream)
    return radc_expected(qm)


def write_kdc_dc120(path, rows8):
    """Kodak DC120 KDC: TIFF with model DC120; 848-byte 8-bit rows with
    the per-row rotating shift (dcraw.cc kodak_dc120_load_raw :3077).
    rows8: (976, 848) uint8 of raw line bytes; returns the expected
    decoded mosaic."""
    rows8 = np.asarray(rows8, dtype=np.uint8)
    assert rows8.shape == (976, 848)
    mul = [162, 192, 187, 92]
    add = [0, 636, 424, 212]
    exp = np.zeros((976, 848), np.int64)
    for r in range(976):
        shift = r * mul[r & 3] + add[r & 3]
        exp[r] = np.roll(rows8[r].astype(np.int64), -shift % 848)

    mk = b"KODAK\0"
    md = b"DC120\0"
    blocks = bytearray()

    def block(data):
        off = 8 + len(blocks)
        blocks.extend(data)
        if len(blocks) & 1:
            blocks.append(0)
        return off

    entries = []

    def entry(tag, type_, count, value):
        entries.append(struct.pack("<HHII", tag, type_, count, value))

    mko = block(mk)
    mdo = block(md)
    stream_off = 8 + len(blocks)
    payload = bytes(blocks) + rows8.tobytes()
    ifd_off = 8 + len(payload) + (len(payload) & 1)
    entry(256, 3, 1, 848)
    entry(257, 3, 1, 976)
    entry(271, 2, len(mk), mko)
    entry(272, 2, len(md), mdo)
    entry(273, 4, 1, stream_off)
    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", ifd_off))
        f.write(payload)
        if len(payload) & 1:
            f.write(b"\0")
        f.write(struct.pack("<H", len(entries)))
        f.write(b"".join(entries))
        f.write(struct.pack("<I", 0))
    return exp


def write_pxn(path, qm):
    """Logitech Fotoman Pixtura: 'PXN' magic, 768x512 at offset 3632."""
    qm = np.asarray(qm)
    assert qm.shape == (512, 768)
    stream = encode_radc_stream(qm)
    hdr = bytearray(3632)
    hdr[0:4] = b"PXN\0"
    with open(path, "wb") as f:
        f.write(bytes(hdr) + stream)
    return radc_expected(qm)
