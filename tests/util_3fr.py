"""Synthetic Hasselblad 3FR writer — test oracle for the native decoder.

Builds a little-endian TIFF whose IFD0 is the raw image (compression 7),
with an ljpeg marker header (SOI/SOF3/DHT/SOS) followed by the
Phase-One-style entropy stream (MSB-first bits in little-endian 32-bit
words) coding column pairs as two Huffman length codes + two ljpeg
difference fields (behavioral spec: dcraw.cc hasselblad_load_raw)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_pef import _build_ifd
from tests.util_srw import _WordBitWriter

# canonical DHT: the 17 possible bit-length values all at code length 5,
# so code(v) == v in 5 bits
_DHT_COUNTS = bytes(17 if i == 5 else 0 for i in range(1, 17))
_DHT_VALS = bytes(range(17))


def _category(diff):
    if diff == 0:
        return 0, 0
    if diff == -32768:
        return 16, 65535
    if diff > 0:
        ln = int(diff).bit_length()
        return ln, diff
    ln = int(-diff).bit_length()
    return ln, diff + (1 << ln) - 1


def _div2(x):
    """C int division by 2 (trunc toward zero)."""
    return -((-x) // 2) if x < 0 else x // 2


def _encode_stream(mosaic, psv):
    h, w = mosaic.shape
    assert w % 2 == 0
    bw = _WordBitWriter()
    b0 = np.zeros(w, np.int64)
    b1 = np.zeros(w, np.int64)
    b2 = np.zeros(w, np.int64)
    tgt = mosaic.astype(np.int64)
    for row in range(h):
        b0, b1, b2 = b1, b2, b0
        for col in range(0, w, 2):
            ds = []
            for s in (col, col + 1):
                pred = 0x8000
                if col:
                    pred = int(b2[s - 2])
                if col and row > 1 and psv == 11:
                    pred += _div2(int(b0[s])) - _div2(int(b0[s - 2]))
                # differences wrap mod 65536; the decoder's back buffers
                # keep the UNMASKED predictor sum (hasselblad_load_raw
                # back[2][s] = pred before the & 0xffff) — mirror that
                d = ((int(tgt[row, s]) - pred + 32768) % 65536) - 32768
                ds.append(d)
                b2[s] = pred + d
            # stream order: both length codes, then both difference
            # fields (hasselblad_load_raw FORC(2) len / FORC(2) diff)
            cats = [_category(d) for d in ds]
            for ln, _ in cats:
                bw.put(ln, 5)  # huffman code == value at length 5
            for ln, v in cats:
                if ln:
                    bw.put(v, ln)
    return bw.flush()


def _ljpeg_header(h, w, psv):
    sof3 = struct.pack(">BHHB", 16, h, w, 1) + bytes((1, 0x11, 0))
    dht = bytes((0,)) + _DHT_COUNTS + _DHT_VALS
    sos = bytes((1, 1, 0, psv, 0, 0))

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    return (b"\xff\xd8" + seg(0xC3, sof3) + seg(0xC4, dht) + seg(0xDA, sos))


def write_3fr(path, mosaic, psv=1, make="Hasselblad", model="SYNTH H3D",
              iso=100, payload=None):
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    if payload is None:
        payload = _ljpeg_header(h, w, psv) + _encode_stream(mosaic, psv)

    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    n0 = 9
    ifd0_sz = 2 + n0 * 12 + 4
    exif_sz = 2 + 1 * 12 + 4
    exif_off = 8 + ifd0_sz
    mk_off = exif_off + exif_sz
    md_off = mk_off + len(mk)
    data_off = md_off + len(md)
    e0 = [
        (256, 3, 1, struct.pack("<H", w)),
        (257, 3, 1, struct.pack("<H", h)),
        (258, 3, 1, struct.pack("<H", 16)),
        (259, 3, 1, struct.pack("<H", 7)),
        (271, 2, len(mk), mk if len(mk) <= 4 else (0, mk_off)),
        (272, 2, len(md), md if len(md) <= 4 else (0, md_off)),
        (273, 4, 1, struct.pack("<I", data_off)),
        (279, 4, 1, struct.pack("<I", len(payload))),
        (34665, 4, 1, struct.pack("<I", exif_off)),
    ]
    ifd0 = _build_ifd(e0)
    exif = _build_ifd([(34855, 3, 1, struct.pack("<H", iso))])
    out = b"II*\x00" + struct.pack("<I", 8) + ifd0 + exif
    if len(mk) > 4:
        out += mk
    if len(md) > 4:
        out += md
    with open(path, "wb") as f:
        f.write(out + payload)
