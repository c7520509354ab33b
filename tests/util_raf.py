"""Synthetic Fuji RAF writer — test oracle for the native RAF decoder.

Classic RAF layout: big-endian container ("FUJIFILMCCD-RAW" magic, model
string at 0x1C, section offsets at 0x54..0x6B), a CFA-header record list
(0x100 dims, 0x131 X-Trans pattern, 0x2ff0 as-shot WB) and an uncompressed
little-endian 16-bit payload."""

from __future__ import annotations

import struct

import numpy as np


def pack_fuji14(mosaic: np.ndarray) -> bytes:
    """Fuji 14-bit packed payload: 4 samples -> 7 bytes inside byte-swapped
    32-bit words (fuji_14bit_load_raw layout, rawimage.cc:726). Width must
    be a multiple of 16 so each row is a whole number of dwords."""
    m = np.asarray(mosaic, dtype=np.uint32)
    h, w = m.shape
    assert w % 16 == 0
    out = bytearray()
    for row in m:
        sw = bytearray(w * 7 // 4)
        for i in range(0, w, 4):
            d = row[i:i + 4]
            o = i * 7 // 4
            sw[o] = (int(d[0]) >> 6) & 0xFF
            sw[o + 1] = ((int(d[0]) & 0x3F) << 2 | int(d[1]) >> 12) & 0xFF
            sw[o + 2] = (int(d[1]) >> 4) & 0xFF
            sw[o + 3] = ((int(d[1]) & 0xF) << 4 | int(d[2]) >> 10) & 0xFF
            sw[o + 4] = (int(d[2]) >> 2) & 0xFF
            sw[o + 5] = ((int(d[2]) & 0x3) << 6 | int(d[3]) >> 8) & 0xFF
            sw[o + 6] = int(d[3]) & 0xFF
        for i in range(0, len(sw), 4):  # stored as swapped dwords
            sw[i:i + 4] = sw[i:i + 4][::-1]
        out += sw
    return bytes(out)


def write_raf(path, mosaic: np.ndarray, xtrans=None, model="X-SYNTH",
              wb_grbg=(1024, 2048, 1536, 1024), payload=None):
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape

    records = []
    records.append((0x100, struct.pack(">HH", h, w)))
    if xtrans is not None:
        # the container stores the pattern reversed: byte k is cell 35-k
        # (dcraw.cc:7683 reads xtrans_abs[0][35-c])
        cells = [int(xtrans[r][c]) for r in range(6) for c in range(6)]
        records.append((0x131, bytes(cells[::-1])))
    records.append((0x2FF0, struct.pack(">HHHH", *wb_grbg)))

    cfa_hdr = struct.pack(">I", len(records))
    for rid, data in records:
        cfa_hdr += struct.pack(">HH", rid, len(data)) + data

    if payload is None:
        payload = mosaic.astype("<u2").tobytes()

    header_len = 0x6C
    cfa_hdr_off = header_len
    cfa_off = cfa_hdr_off + len(cfa_hdr)

    out = bytearray(b"\x00" * header_len)
    out[0:16] = b"FUJIFILMCCD-RAW "
    mb = model.encode()[:31]
    out[0x1C : 0x1C + len(mb)] = mb
    struct.pack_into(">II", out, 0x5C, cfa_hdr_off, len(cfa_hdr))
    struct.pack_into(">II", out, 0x64, cfa_off, len(payload))
    out += cfa_hdr + payload
    with open(path, "wb") as f:
        f.write(bytes(out))
