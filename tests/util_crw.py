"""Synthetic Canon CRW (CIFF) writer — test oracle for the native
decoder.

Encodes the CIFF heap (directory offset in the trailing 4 bytes,
10-byte records: ImageSpec 0x1031, decoder-table 0x1835, make/model
0x080a, WB 0x10a9) and the Canon compressed stream: 64-pixel blocks of
huffman-coded diffs (JPEG-style run/size symbols over the fixed
first/second code tables), two interleaved column-parity predictors
starting at 512 per raw row, dc carry across blocks, 0xff00 byte
stuffing, optional uncompressed 2-bit low planes at offset 26 with the
10-bit stream at 540. Reference behavior boundary: dcraw.cc
crw_init_tables :700 / canon_load_raw :783 / parse_ciff :7418 (the code
tables are fixed camera-side constants of the format).
"""

from __future__ import annotations

import struct

import numpy as np

FIRST_TREE = [
    [0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0x04, 0x03, 0x05, 0x06, 0x02, 0x07, 0x01, 0x08, 0x09, 0x00,
     0x0a, 0x0b],
    [0, 2, 2, 3, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0,
     0x03, 0x02, 0x04, 0x01, 0x05, 0x00, 0x06, 0x07, 0x09, 0x08,
     0x0a, 0x0b],
    [0, 0, 6, 3, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0x06, 0x05, 0x07, 0x04, 0x08, 0x03, 0x09, 0x02, 0x00, 0x0a,
     0x01, 0x0b],
]

SECOND_TREE = [
    [0, 2, 2, 2, 1, 4, 2, 1, 2, 5, 1, 1, 0, 0, 0, 139,
     0x03, 0x04, 0x02, 0x05, 0x01, 0x06, 0x07, 0x08,
     0x12, 0x13, 0x11, 0x14, 0x09, 0x15, 0x22, 0x00, 0x21, 0x16,
     0x0a, 0xf0,
     0x23, 0x17, 0x24, 0x31, 0x32, 0x18, 0x19, 0x33, 0x25, 0x41,
     0x34, 0x42,
     0x35, 0x51, 0x36, 0x37, 0x38, 0x29, 0x79, 0x26, 0x1a, 0x39,
     0x56, 0x57,
     0x28, 0x27, 0x52, 0x55, 0x58, 0x43, 0x76, 0x59, 0x77, 0x54,
     0x61, 0xf9,
     0x71, 0x78, 0x75, 0x96, 0x97, 0x49, 0xb7, 0x53, 0xd7, 0x74,
     0xb6, 0x98,
     0x47, 0x48, 0x95, 0x69, 0x99, 0x91, 0xfa, 0xb8, 0x68, 0xb5,
     0xb9, 0xd6,
     0xf7, 0xd8, 0x67, 0x46, 0x45, 0x94, 0x89, 0xf8, 0x81, 0xd5,
     0xf6, 0xb4,
     0x88, 0xb1, 0x2a, 0x44, 0x72, 0xd9, 0x87, 0x66, 0xd4, 0xf5,
     0x3a, 0xa7,
     0x73, 0xa9, 0xa8, 0x86, 0x62, 0xc7, 0x65, 0xc8, 0xc9, 0xa1,
     0xf4, 0xd1,
     0xe9, 0x5a, 0x92, 0x85, 0xa6, 0xe7, 0x93, 0xe8, 0xc1, 0xc6,
     0x7a, 0x64,
     0xe1, 0x4a, 0x6a, 0xe6, 0xb3, 0xf1, 0xd3, 0xa5, 0x8a, 0xb2,
     0x9a, 0xba,
     0x84, 0xa4, 0x63, 0xe5, 0xc5, 0xf3, 0xd2, 0xc4, 0x82, 0xaa,
     0xda, 0xe4,
     0xf2, 0xca, 0x83, 0xa3, 0xa2, 0xc3, 0xea, 0xc2, 0xe2, 0xe3],
]


def build_codes(table):
    """symbol -> (code, nbits) canonical JPEG codes from a count+value
    table."""
    counts = table[:16]
    vals = list(table[16:])
    # the length-16 bucket is mostly 0xff filler codes (decoder skips
    # them); tables may omit the tail
    vals += [0xFF] * (sum(counts) - len(vals))
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            sym = vals[k]
            if sym not in out:
                out[sym] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class BitWriter:
    """MSB-first writer with JPEG-style 0xff -> 0xff00 stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, nbits):
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s (never 0xff00)
        return bytes(self.out)


def _mag_bits(d):
    """(nbits, code) for a diff in the JPEG magnitude convention."""
    n = int(abs(d)).bit_length()
    if d >= 0:
        return n, d
    return n, d + (1 << n) - 1


def encode_canon_stream(pix, table=0):
    """pix: (H, W) int array of 10-bit values. Returns the compressed
    byte stream (to be placed at offset 540 [+ low planes])."""
    h, w = pix.shape
    assert w % 8 == 0 and (w * 8) % 64 == 0
    assert table == 0, "writer ships the table-0 code pair only"
    c1 = build_codes(FIRST_TREE[table])
    c2 = build_codes(SECOND_TREE[table])
    bw = BitWriter()
    carry = 0
    pnum = 0
    base = [0, 0]
    flat = pix.reshape(-1)
    pos = 0
    nblocks_total = h * w // 64
    for _ in range(nblocks_total):
        diffs = []
        for i in range(64):
            if pnum % w == 0:
                base[0] = base[1] = 512
            v = int(flat[pos])
            d = v - base[i & 1]
            base[i & 1] = v
            diffs.append(d)
            pnum += 1
            pos += 1
        enc0 = diffs[0] - carry
        carry = diffs[0]
        diffs[0] = enc0
        i = 0
        while i < 64:
            codes = c1 if i == 0 else c2
            d = diffs[i]
            if d == 0 and i > 0:
                j = i
                while j < 64 and diffs[j] == 0:
                    j += 1
                if j == 64:  # EOB
                    code, n = codes[0x00]
                    bw.put(code, n)
                    break
                run = j - i
                while run >= 16:
                    code, n = codes[0xF0]
                    bw.put(code, n)
                    run -= 16
                    i += 16
                nb, mag = _mag_bits(diffs[i + run])
                code, n = codes[(run << 4) | nb]
                bw.put(code, n)
                bw.put(mag, nb)
                i += run + 1
            else:
                nb, mag = _mag_bits(d)
                code, n = codes[nb]
                bw.put(code, n)
                if nb:
                    bw.put(mag, nb)
                i += 1
    return bw.flush()


def write_crw(path, pix, table=0, lowbits=False, make="Canon",
              model="Canon EOS 10D", wb_rgg2b=None):
    """Write a CRW file holding `pix` ((H, W) uint, 10-bit or 12-bit
    domain when lowbits). Returns the stored values (== pix clipped)."""
    pix = np.asarray(pix, dtype=np.int64)
    h, w = pix.shape
    if lowbits:
        pix = np.clip(pix, 0, 4095)
        high = pix >> 2
        low = pix & 3
    else:
        pix = np.clip(pix, 0, 1023)
        high = pix
        low = None
    stream = encode_canon_stream(high, table=table)

    hlen = 26
    out = bytearray()
    out += b"II" + struct.pack("<I", hlen) + b"HEAPCCDR"
    out += bytes(hlen - len(out))
    if lowbits:
        lowplane = bytearray(h * w // 4)
        lf = low.reshape(-1)
        for i in range(0, h * w, 4):
            lowplane[i // 4] = (int(lf[i]) | (int(lf[i + 1]) << 2)
                               | (int(lf[i + 2]) << 4)
                               | (int(lf[i + 3]) << 6))
        out += bytes(lowplane)
    data_off = 540 + (h * w // 4 if lowbits else 0)
    out += bytes(data_off - len(out))
    out += stream
    if not lowbits and len(out) < 0x4000:
        # keep the heap directory past the canon_has_lowbits scan window
        # (record offsets/lengths may contain 0xff bytes, which would
        # misread as uncompressed low planes)
        out += bytes(0x4000 - len(out))

    # heap records
    recs = []  # (type, len, heap_rel_off)

    def add(type_, payload):
        off = len(out) - hlen
        recs.append((type_, len(payload), off))
        out.extend(payload)

    add(0x1031, struct.pack("<4H", 0, w, h, 0))
    add(0x1835, struct.pack("<I", table))
    mk = make.encode()[:63]
    md = model.encode()[:63]
    add(0x080a, mk + b"\0" + md + b"\0"
        + bytes(128 - len(mk) - len(md) - 2))
    if wb_rgg2b is not None:
        r_, g_, g2, b_ = wb_rgg2b
        add(0x10a9, struct.pack("<5H", 0, r_, g_, g2, b_))
    tboff = len(out) - hlen
    out += struct.pack("<H", len(recs))
    for type_, ln, off in recs:
        out += struct.pack("<HII", type_, ln, off)
    out += struct.pack("<I", tboff)
    with open(path, "wb") as f:
        f.write(out)
    return pix.astype(np.uint16)
