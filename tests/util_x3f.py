"""Synthetic Sigma X3F writer (test oracle for the native Foveon decoder).

Encodes the three raw-section formats the decoder supports, per the
bitstream model of dcraw (reference behavior boundary:
dcraw.cc foveon_dp_load_raw :3867, foveon_sd_load_raw :3820,
foveon_decoder :3749, parse_foveon :7899):

- format 30 ("TRUE" engine, Merrill/DP/SD1): three planes of
  differential huffman; 13-entry (clen, code) prefix table; dual
  column predictors, row-parity vertical predictors for columns 0/1.
- format 5: 1024-entry i16 diff table + one u32 per pixel packing
  three 10-bit table indices.
- format 6: the same diff table + a 1024-entry code-word table
  (len<<27 | path) + a 32-bit-group bitstream, rows group-aligned.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitsMSB:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes_padded(self, align_bits=8):
        b = list(self.bits)
        while len(b) % align_bits:
            b.append(0)
        out = bytearray()
        for i in range(0, len(b), 8):
            acc = 0
            for bit in b[i : i + 8]:
                acc = (acc << 1) | bit
            out.append(acc)
        return bytes(out)


def _category(diff):
    return 0 if diff == 0 else int(abs(diff)).bit_length()


def encode_true_plane(plane):
    """One TRUE-engine plane bitstream (4-bit category codes)."""
    h, w = plane.shape
    bw = _BitsMSB()
    vpred = [[512, 512], [512, 512]]
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            val = int(plane[row, col]) & 0xFFFF
            if col < 2:
                diff = val - vpred[row & 1][col]
                vpred[row & 1][col] = val
                hpred[col] = val
            else:
                diff = val - hpred[col & 1]
                hpred[col & 1] = val
            t = _category(diff)
            assert t <= 12, "diff too large for the 13-category table"
            bw.put(t, 4)  # fixed 4-bit prefix = category index
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.put(v, t)
    return bw.bytes_padded()


def _true_section_payload(rgb):
    """TRUE raw section data: header + 16-byte-aligned planes."""
    planes = [encode_true_plane(rgb[c]) for c in range(3)]
    head = bytearray(8)  # seed/unknown words (skipped by the decoder)
    for i in range(13):  # (clen=4, code=i<<4): prefix value == category
        head += bytes([4, i << 4])
    head += b"\0\0"
    for p in planes:
        head += struct.pack("<I", len(p))
    assert len(head) == 48
    out = bytearray(head)
    for p in planes:
        out += p
        while len(out) % 16:
            out.append(0)
    return bytes(out)


def _packed_section_payload(rgb):
    """Format-5 data: diff table (i16 d = i - 512) + u32 per pixel."""
    _, h, w = rgb.shape
    table = np.arange(1024, dtype=np.int64) - 512
    out = bytearray()
    for d in table:
        out += struct.pack("<h", int(d))
    pred = np.zeros(3, np.int64)
    for row in range(h):
        pred[:] = 0
        for col in range(w):
            word = 0
            # decoder: pred[2-c] += diff[(v >> 10c) & 0x3ff]
            for c in range(3):
                plane = 2 - c
                d = int(rgb[plane, row, col]) - int(pred[plane])
                assert -512 <= d < 512
                pred[plane] += d
                word |= (d + 512) << (c * 10)
            out += struct.pack("<I", word)
    return bytes(out)


def _huff_section_payload(rgb, row_skip_quirk=False):
    """Format-6 data: diff table + code table + 32-bit-group bitstream.

    Code words are fixed 10-bit (codes[i] = 10<<27 | i); rows are
    flushed to a 32-bit boundary (dcraw resets `bit` per row).
    row_skip_quirk: prepend a dummy u32 at rows where the previous row
    ended group-aligned (SD9/SD10 behavior, model number < 14)."""
    _, h, w = rgb.shape
    table = np.arange(1024, dtype=np.int64) - 512
    out = bytearray()
    for d in table:
        out += struct.pack("<h", int(d))
    for i in range(1024):
        out += struct.pack("<I", (10 << 27) | i)
    pred = np.zeros(3, np.int64)
    # dcraw skips one u32 at rows whose previous row consumed an exact
    # multiple of 32 bits (its `bit` state lands on 0)
    aligned_rows = (w * 30) % 32 == 0
    for row in range(h):
        pred[:] = 0
        if row_skip_quirk and row > 0 and aligned_rows:
            out += b"\xde\xad\xbe\xef"
        bw = _BitsMSB()
        for col in range(w):
            for c in range(3):
                d = int(rgb[c, row, col]) - int(pred[c])
                assert -512 <= d < 512
                pred[c] += d
                bw.put(d + 512, 10)
        out += bw.bytes_padded(align_bits=32)
    return bytes(out)


def _quattro_section_payload(q0, q1, p2):
    """Format-35 (Quattro) data: 16-byte per-plane-dims prefix, then
    the TRUE structure (x3f_tools x3f_io.c layout). q0/q1 are the
    quarter-resolution top planes, p2 the full-resolution plane."""
    planes_arr = [q0, q1, p2]
    enc = [encode_true_plane(p) for p in planes_arr]
    head = bytearray()
    for p in planes_arr:
        head += struct.pack("<HH", p.shape[0], p.shape[1])
    head += struct.pack("<I", 1)  # quattro layout word
    head += bytes(8)  # TRUE seeds/unknown
    for i in range(13):
        head += bytes([4, i << 4])
    head += b"\0\0"
    for p in enc:
        head += struct.pack("<I", len(p))
    assert len(head) == 16 + 48
    out = bytearray(head)
    for p in enc:
        out += p
        while len(out) % 16:
            out.append(0)
    return bytes(out)


def write_x3f_quattro(path, q0, q1, p2, make="SIGMA",
                      model="sd Quattro", iso=100):
    """Write a synthetic Quattro X3F; returns the expected (3, H, W)
    decode (quarter planes 2x2-replicated)."""
    q0 = np.asarray(q0)
    q1 = np.asarray(q1)
    p2 = np.asarray(p2)
    h, w = p2.shape
    payload = _quattro_section_payload(q0, q1, p2)
    rgb = np.zeros((3, h, w), np.uint16)
    write_x3f(path, rgb, fmt=35, make=make, model=model, iso=iso,
              payload=payload)
    exp = np.zeros((3, h, w), np.int64)
    for c, q in enumerate((q0, q1)):
        rep = np.repeat(np.repeat(q, 2, axis=0), 2, axis=1)
        exp[c] = rep[:h, :w]
    exp[2] = p2
    return exp


def write_x3f(path, rgb, fmt=30, make="SIGMA", model="DP2 Merrill",
              iso=200, rotation=0, payload=None):
    """Write a minimal X3F: FOVb header, one raw IMAG section (type 3),
    a PROP section (CAMMANUF/CAMMODEL/ISO), directory at EOF.
    payload: raw section-data override (hand-built vectors)."""
    rgb = np.asarray(rgb)
    assert rgb.ndim == 3 and rgb.shape[0] == 3
    _, h, w = rgb.shape
    if payload is not None:
        pass
    elif fmt == 30:
        payload = _true_section_payload(rgb)
    elif fmt == 5:
        payload = _packed_section_payload(rgb)
    elif fmt == 6:
        quirk = model.startswith("SD") and int(model[2:4] or 99) < 14
        payload = _huff_section_payload(rgb, row_skip_quirk=quirk)
    else:
        raise ValueError(fmt)

    header = bytearray()
    header += b"FOVb"
    header += struct.pack("<I", 0x00020003)  # version
    header += b"\0" * 16  # unique id
    header += struct.pack("<I", 0)  # mark bits
    header += struct.pack("<II", w, h)  # columns, rows
    header += struct.pack("<I", rotation)
    assert len(header) == 40

    # image section
    img = bytearray()
    img += b"SECi"
    img += struct.pack("<I", 0x00020003)
    img += struct.pack("<I", 3)  # type: raw
    img += struct.pack("<I", fmt)
    img += struct.pack("<III", w, h, 0)  # cols, rows, row_stride
    img += payload

    # property list (UTF-16LE name/value pairs)
    props = [("CAMMANUF", make), ("CAMMODEL", model), ("ISO", str(iso))]
    chars = bytearray()
    offs = []
    for name, value in props:
        noff = len(chars) // 2
        chars += name.encode("utf-16-le") + b"\0\0"
        voff = len(chars) // 2
        chars += value.encode("utf-16-le") + b"\0\0"
        offs.append((noff, voff))
    prop = bytearray()
    prop += b"SECp"
    prop += struct.pack("<I", 0x00020000)
    prop += struct.pack("<I", len(props))
    prop += struct.pack("<I", 0)  # char format: UTF-16
    prop += struct.pack("<I", 0)  # reserved
    prop += struct.pack("<I", len(chars) // 2)
    for noff, voff in offs:
        prop += struct.pack("<II", noff, voff)
    prop += chars

    out = bytearray(header)
    img_off = len(out)
    out += img
    prop_off = len(out)
    out += prop
    dir_off = len(out)
    out += b"SECd"
    out += struct.pack("<I", 0x00020000)
    out += struct.pack("<I", 2)
    out += struct.pack("<II", img_off, len(img)) + b"IMAG"
    out += struct.pack("<II", prop_off, len(prop)) + b"PROP"
    out += struct.pack("<I", dir_off)
    with open(path, "wb") as f:
        f.write(bytes(out))
    return rgb.astype(np.uint16)
