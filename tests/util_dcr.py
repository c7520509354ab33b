"""Synthetic Kodak DCR writer (test oracle for the native decoder).

TIFF container with a compression-65000 CFA IFD; stream per <=256-pixel
row segment: nibble-packed magnitude lengths, then var-length diffs
consumed LSB-first from a queue of big-endian u16 words (32-bit refills
with byte pairs swapped — dcraw.cc kodak_65000_decode :3199), column-
parity predictors from 0 per segment; tag 2317 carries the
linearization curve, tag 1021 the software WB block.
"""

from __future__ import annotations

import struct

import numpy as np


def _mag(d):
    n = int(abs(int(d))).bit_length()
    if d >= 0:
        return n, int(d)
    return n, int(d) + (1 << n) - 1


def encode_segment(diffs):
    """Encode one segment (diffs already predictor-differenced, padded
    handling inside). Returns bytes."""
    blen = len(diffs)
    bsize = (blen + 3) & ~3
    vals = list(diffs) + [0] * (bsize - blen)
    lens = []
    bits = []  # logical bitstream, LSB-first
    for d in vals:
        n, mag = _mag(d)
        assert n <= 12
        lens.append(n)
        for j in range(n):
            bits.append((mag >> j) & 1)
    out = bytearray()
    for i in range(0, bsize, 2):
        out.append(lens[i] | (lens[i + 1] << 4))
    # simulate the decoder's refill schedule to size the word queue
    avail = 16 if (bsize & 7) == 4 else 0
    words_read = 1 if (bsize & 7) == 4 else 0
    for n in lens:
        if avail < n:
            avail += 32
            words_read += 2
        avail -= n
    nwords = max(words_read, (len(bits) + 15) // 16)
    # decoder reads in fixed chunks; give it exactly words_read words
    assert words_read >= (len(bits) + 15) // 16
    words = []
    for k in range(words_read):
        w = 0
        for j in range(16):
            idx = 16 * k + j
            if idx < len(bits) and bits[idx]:
                w |= 1 << j
        words.append(w)
    for w in words:
        out += struct.pack(">H", w)
    return bytes(out)


def encode_dcr_stream(idx_plane):
    """idx_plane: (H, W) curve indices (0..4095). Returns the stream."""
    h, w = idx_plane.shape
    out = bytearray()
    for row in range(h):
        for col in range(0, w, 256):
            seg = idx_plane[row, col : col + 256].astype(np.int64)
            pred = [0, 0]
            diffs = []
            for i, v in enumerate(seg):
                diffs.append(int(v) - pred[i & 1])
                pred[i & 1] = int(v)
            out += encode_segment(diffs)
    return bytes(out)


def write_dcr(path, idx_plane, curve=None, wb_rgb=None,
              make="KODAK", model="DCS Pro 14N", stream=None):
    """Write a synthetic DCR. idx_plane holds curve indices; the decoded
    image is curve[idx]. Returns the expected decoded uint16 plane.
    stream: raw 65000-codec byte override (hand-built vectors)."""
    idx_plane = np.asarray(idx_plane, dtype=np.int64)
    h, w = idx_plane.shape
    if curve is None:
        curve = np.arange(0x1000, dtype=np.uint16)
    curve = np.asarray(curve, dtype=np.uint16)
    if stream is None:
        stream = encode_dcr_stream(idx_plane)

    tags = []  # (tag, type, count, payload_bytes or int)

    def add(tag, type_, count, value):
        tags.append((tag, type_, count, value))

    header_end = 8
    # lay out: header | tag data blocks | stream | IFD
    blocks = bytearray()

    def block(data):
        off = header_end + len(blocks)
        blocks.extend(data)
        if len(blocks) & 1:
            blocks.append(0)
        return off

    mk = make.encode() + b"\0"
    md = model.encode() + b"\0"
    mko = block(mk)
    mdo = block(md)
    curve_off = block(b"".join(struct.pack("<H", int(v)) for v in curve))
    wb_off = None
    if wb_rgb is not None:
        wb_vals = [0] * 20 + [int(v) for v in wb_rgb] + [0] * 13
        wb_off = block(b"".join(struct.pack("<H", v) for v in wb_vals))
    stream_off = header_end + len(blocks)
    payload = bytes(blocks) + stream
    ifd_off = header_end + len(payload) + (len(payload) & 1)

    entries = []

    def entry(tag, type_, count, value_or_off, inline=False):
        if inline:
            val = struct.pack("<I", value_or_off)
        else:
            val = struct.pack("<I", value_or_off)
        entries.append(struct.pack("<HHI", tag, type_, count) + val)

    entry(256, 3, 1, w, inline=True)
    entry(257, 3, 1, h, inline=True)
    entry(258, 3, 1, 16, inline=True)
    entry(259, 3, 1, 65000, inline=True)
    entry(262, 3, 1, 32803, inline=True)
    entry(271, 2, len(mk), mko)
    entry(272, 2, len(md), mdo)
    entry(273, 4, 1, stream_off)
    entry(277, 3, 1, 1, inline=True)
    entry(278, 3, 1, h, inline=True)
    entry(279, 4, 1, len(stream))
    entry(2317, 3, len(curve), curve_off)
    if wb_off is not None:
        entry(1021, 3, 36, wb_off)
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    out = bytearray()
    out += b"II*\0" + struct.pack("<I", ifd_off)
    out += payload
    if len(out) & 1:
        out.append(0)
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(out)
    full = np.zeros(0x10000, np.uint16)
    full[: len(curve)] = curve
    full[len(curve):] = curve[-1]
    return full[idx_plane]
