"""Synthetic Fuji RAF writer — test oracle for the native RAF decoder.

Classic RAF layout: big-endian container ("FUJIFILMCCD-RAW" magic, model
string at 0x1C, section offsets at 0x54..0x6B), a CFA-header record list
(0x100 dims, 0x131 X-Trans pattern, 0x2ff0 as-shot WB) and an uncompressed
little-endian 16-bit payload."""

from __future__ import annotations

import struct

import numpy as np


def write_raf(path, mosaic: np.ndarray, xtrans=None, model="X-SYNTH",
              wb_grbg=(1024, 2048, 1536, 1024)):
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape

    records = []
    records.append((0x100, struct.pack(">HH", h, w)))
    if xtrans is not None:
        flat = bytes(int(xtrans[r][c]) for r in range(6) for c in range(6))
        records.append((0x131, flat))
    records.append((0x2FF0, struct.pack(">HHHH", *wb_grbg)))

    cfa_hdr = struct.pack(">I", len(records))
    for rid, data in records:
        cfa_hdr += struct.pack(">HH", rid, len(data)) + data

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
