"""Synthetic Sony ARW2 writer (test oracle for the native decoder).

Encodes the ARW2 "cRAW" block layout (16 pixels of one CFA color per
16-byte block: 32-bit header with 11-bit min/max + their 4-bit indices,
fourteen 7-bit shifted deltas from bit 30) plus the tag-0x7010
linearization curve and the tag-0x7313 WB levels, per the public format
description (reference behavior: dcraw.cc sony_arw2_load_raw).
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_KNOTS = (1000, 2000, 3000, 4000)


def sony_curve(knots=DEFAULT_KNOTS):
    """The 12-bit-domain linearization curve: identity base, then five
    segments of slope 1, 2, 4, 8, 16 between the knots (and 4095)."""
    curve = np.arange(0x1000, dtype=np.int64)
    ks = [0, *knots, 4095]
    for i in range(5):
        for j in range(ks[i] + 1, ks[i + 1] + 1):
            curve[j] = curve[j - 1] + (1 << i)
    return curve.astype(np.uint16)


def encode_arw2_block(vals):
    """Encode 16 pixel values (11-bit domain) into one 16-byte block."""
    vals = [int(v) & 0x7FF for v in vals]
    vmax = max(vals)
    vmin = min(vals)
    imax = vals.index(vmax)
    imin = vals.index(vmin)
    if imax == imin:  # all equal: positions must differ (14 delta slots)
        imin = (imax + 1) % 16
    sh = 0
    while sh < 4 and (0x80 << sh) <= vmax - vmin:
        sh += 1
    bits = (vmax & 0x7FF) | ((vmin & 0x7FF) << 11) \
        | ((imax & 0xF) << 22) | ((imin & 0xF) << 26)
    acc = bits
    pos = 30
    for i, v in enumerate(vals):
        if i == imax or i == imin:
            continue
        delta = ((v - vmin) >> sh) & 0x7F
        acc |= delta << pos
        pos += 7
    return acc.to_bytes(16, "little")


def decode_arw2_block(block):
    """Independent pure-Python block decoder (11-bit domain)."""
    acc = int.from_bytes(block, "little")
    vmax = acc & 0x7FF
    vmin = (acc >> 11) & 0x7FF
    imax = (acc >> 22) & 0xF
    imin = (acc >> 26) & 0xF
    sh = 0
    while sh < 4 and (0x80 << sh) <= vmax - vmin:
        sh += 1
    out = []
    pos = 30
    for i in range(16):
        if i == imax:
            out.append(vmax)
        elif i == imin:
            out.append(vmin)
        else:
            out.append(min((((acc >> pos) & 0x7F) << sh) + vmin, 0x7FF))
            pos += 7
    return out


def encode_arw2_plane(pix):
    """(H, W) 11-bit-domain mosaic -> 1 byte/pixel ARW2 payload.

    Block stream order per row: even columns of each 32-column span,
    then its odd columns (the decoder's col interleave)."""
    h, w = pix.shape
    assert w % 32 == 0, "width must be a multiple of 32"
    payload = bytearray()
    for row in range(h):
        for span in range(0, w, 32):
            for phase in (0, 1):
                vals = [pix[row, span + phase + 2 * k] for k in range(16)]
                payload += encode_arw2_block(vals)
    return bytes(payload)


def write_arw2(path, pix, knots=DEFAULT_KNOTS, wb_rggb=(2100, 1024, 1024,
                                                        1800),
               make="SONY", model="TEST-1", iso=100,
               cfa=(0, 1, 1, 2), payload=None):
    """Write a minimal ARW2 file: IFD0 is the raw IFD (compression 32767)
    plus the Sony curve/WB tags. Returns the expected decoded u16 image
    (curve[pix << 1]). payload: raw block-stream override (hand-built
    vectors); pix still defines the dimensions/expected values."""
    h, w = pix.shape
    if payload is None:
        payload = encode_arw2_plane(pix)
    assert len(payload) == h * w

    entries = []
    extra = bytearray()

    def add(tag, typ, vals):
        sizes = {1: 1, 3: 2, 4: 4}
        packed = b"".join(
            struct.pack("<" + {1: "B", 3: "H", 4: "I"}[typ], int(v))
            for v in vals)
        entries.append((tag, typ, len(vals), packed))

    def add_str(tag, s):
        entries.append((tag, 2, len(s) + 1, s.encode() + b"\0"))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [12])
    add(259, 3, [32767])
    add(262, 3, [32803])
    add_str(271, make)
    add_str(272, model)
    add(274, 3, [1])
    add(277, 3, [1])
    add(278, 4, [h])
    add(33421, 3, [2, 2])
    add(33422, 1, list(cfa))
    add(34855, 3, [iso])
    add(28688, 3, [k << 2 for k in knots])
    add(29459, 3, list(wb_rggb))
    # strip offset/count patched after layout
    add(273, 4, [0])
    add(279, 4, [len(payload)])

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
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, field in fields:
        if tag == 273:
            field = struct.pack("<I", strip_off)
        out += struct.pack("<HHI", tag, typ, count) + field
    out += struct.pack("<I", 0)
    out += blobs
    out += payload
    with open(path, "wb") as f:
        f.write(out)

    curve = sony_curve(knots)
    expected = curve[(pix.astype(np.int64) << 1) & 0xFFF]
    return expected


def quad_tiles(pix, tw, th):
    """(H, W) mosaic -> list of (tile_index, (th//2, tw//2, 4)) quad
    rasters in the LJ92 tile sample layout (group of 4 = 2x2 quad)."""
    h, w = pix.shape
    tiles = []
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tile = np.zeros((th, tw), np.int64)
            sub = pix[ty : ty + th, tx : tx + tw]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            quads = np.stack(
                [tile[0::2, 0::2], tile[0::2, 1::2],
                 tile[1::2, 0::2], tile[1::2, 1::2]], axis=-1)
            tiles.append(quads)
    return tiles


def write_arw_lossless(path, pix, tile=(64, 32), precision=14,
                       wb_rggb=(2100, 1024, 1024, 1800), make="SONY",
                       model="TEST-LL", iso=100, cfa=(0, 1, 1, 2),
                       payloads=None):
    """Write a Sony lossless-compressed ARW: raw IFD with compression 7
    and LJ92 tiles whose 4-component samples are 2x2 Bayer quads (the
    layout LibRaw's sony_ljpeg_load_raw consumes; the reference reaches
    this format only via its optional LibRaw backend, rawimage.h:81).
    payloads: per-tile LJ92 stream overrides (hand-built vectors)."""
    from tests.util_cr2 import lj92_encode_comps

    h, w = pix.shape
    tw, tile_h = tile
    if payloads is None:
        payloads = [lj92_encode_comps(q, precision=precision)
                    for q in quad_tiles(pix, tw, tile_h)]

    entries = []

    def add(tag, typ, vals):
        packed = b"".join(
            struct.pack("<" + {1: "B", 3: "H", 4: "I"}[typ], int(v))
            for v in vals)
        entries.append((tag, typ, len(vals), packed))

    def add_str(tag, s):
        entries.append((tag, 2, len(s) + 1, s.encode() + b"\0"))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [precision])
    add(259, 3, [7])
    add(262, 3, [32803])
    add_str(271, make)
    add_str(272, model)
    add(274, 3, [1])
    add(277, 3, [1])
    add(322, 4, [tw])
    add(323, 4, [tile_h])
    add(33421, 3, [2, 2])
    add(33422, 1, list(cfa))
    add(34855, 3, [iso])
    add(29459, 3, list(wb_rggb))
    # tile offsets/counts patched after layout
    add(324, 4, [0] * len(payloads))
    add(325, 4, [len(p) for p in payloads])

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
    tiles_off = data_off + len(blobs)
    offs = []
    pos = tiles_off
    for p in payloads:
        offs.append(pos)
        pos += len(p)
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, field in fields:
        if tag == 324:
            if len(offs) == 1:
                field = struct.pack("<I", offs[0])
            else:
                # multi-value: offsets live in the blob area — patch there
                field = field  # placeholder, patched below
        out += struct.pack("<HHI", tag, typ, count) + field
    out += struct.pack("<I", 0)
    out += blobs
    for p in payloads:
        out += p
    # patch multi-value tile offsets inside the blob area
    if len(offs) > 1:
        blob_pos = data_off
        for tag, typ, count, packed in entries:
            size = len(packed)
            if size <= 4:
                continue
            if tag == 324:
                for i, o in enumerate(offs):
                    out[blob_pos + 4 * i : blob_pos + 4 * i + 4] = (
                        struct.pack("<I", o))
            blob_pos += size
    with open(path, "wb") as f:
        f.write(out)
    return pix.astype(np.uint16)
