"""Synthetic Minolta MRW writer — test oracle for the native MRW decoder.

Builds the documented container (dcraw.cc parse_minolta :7304 as the
behavioral spec): big-endian "\\0MRM" block chain with \\0PRD (sensor
dims + storage method), \\0WBG (R,G1,G2,B gains), \\0TTW (embedded
little-endian TIFF carrying make/model/orientation and an EXIF IFD with
ISO), followed by the CFA payload — 12-bit MSB-packed (storage 0x59) or
16-bit big-endian unpacked (storage 0x52)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_pef import _build_ifd


def _pack12(mosaic):
    flat = np.asarray(mosaic, np.uint32).ravel()
    out = bytearray()
    acc = 0
    nbits = 0
    for v in flat:
        acc = (acc << 12) | int(v & 0xFFF)
        nbits += 12
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _embedded_tiff(make, model, iso, orientation):
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    # layout: header(8) | IFD0 | EXIF IFD | make str | model str
    n0 = 4  # 271, 272, 274, 34665
    ifd0_sz = 2 + n0 * 12 + 4
    exif_sz = 2 + 1 * 12 + 4
    exif_off = 8 + ifd0_sz
    mk_off = exif_off + exif_sz
    md_off = mk_off + len(mk)
    e0 = [
        (271, 2, len(mk), mk if len(mk) <= 4 else (0, mk_off)),
        (272, 2, len(md), md if len(md) <= 4 else (0, md_off)),
        (274, 3, 1, struct.pack("<H", orientation)),
        (34665, 4, 1, struct.pack("<I", exif_off)),
    ]
    ifd0 = _build_ifd(e0)
    exif = _build_ifd([(34855, 3, 1, struct.pack("<H", iso))])
    out = b"II*\x00" + struct.pack("<I", 8) + ifd0 + exif
    if len(mk) > 4:
        out += mk
    if len(md) > 4:
        out += md
    return out


def write_mrw(path, mosaic, storage=0x59, make="Minolta",
              model="DYNAX 7D", iso=200,
              wb_rg1g2b=(520, 256, 256, 312), orientation=1,
              payload=None):
    """storage: 0x59 = 12-bit packed, 0x52 = 16-bit unpacked words.
    payload: raw byte override for hand-built vectors."""
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    assert mosaic.max() < 4096

    def block(tag3, body):
        return b"\x00" + tag3 + struct.pack(">I", len(body)) + body

    prd = (b"27730001"
           + struct.pack(">HHHH", h, w, h, w)
           + bytes((12, 12, storage)) + b"\x00\x00\x00\x00\x00")
    wbg = bytes(4) + b"".join(struct.pack(">H", g) for g in wb_rg1g2b)
    ttw = _embedded_tiff(make, model, iso, orientation)

    body = block(b"PRD", prd) + block(b"WBG", wbg) + block(b"TTW", ttw)
    if payload is None:
        if storage == 0x59:
            payload = _pack12(mosaic)
        else:
            payload = mosaic.astype(">u2").tobytes()
    with open(path, "wb") as f:
        f.write(b"\x00MRM" + struct.pack(">I", len(body)) + body + payload)
