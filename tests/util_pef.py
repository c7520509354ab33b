"""Synthetic Pentax PEF writer — test oracle for the native PEF decoder.

Builds a PEF: TIFF whose IFD0 is the raw image (compression 65535),
an EXIF IFD carrying ISO and a "PENTAX "-style MakerNote with the
huffman table (tag 0x220), BlackPoint (0x200) and WhitePoint (0x201),
and the MSB-first bitstream of huffman-coded (category, magnitude bits)
differences with the Pentax two-back / row-pair predictors
(reference behavior: dcraw.cc pentax_load_raw)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_nef import _BitWriter

# code lengths per ssss category 0..12 (kraft-complete so the decoder's
# 4096-entry LUT has no holes)
_CAT_LENS = (2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 9)


def _codes():
    """Canonical codes for _CAT_LENS: (len, code, start12) per category."""
    order = sorted(range(len(_CAT_LENS)), key=lambda c: (_CAT_LENS[c], c))
    code = 0
    prev_len = _CAT_LENS[order[0]]
    out = [None] * len(_CAT_LENS)
    for c in order:
        ln = _CAT_LENS[c]
        code <<= (ln - prev_len)
        prev_len = ln
        out[c] = (ln, code, code << (12 - ln))
        code += 1
    return out


def _encode_stream(mosaic, bps):
    codes = _codes()
    h, w = mosaic.shape
    img = mosaic.astype(np.int64)
    vpred = np.zeros((2, 2), dtype=np.int64)
    bw = _BitWriter()
    for row in range(h):
        for col in range(w):
            if col < 2:
                pred = vpred[row & 1, col]
            else:
                pred = img[row, col - 2]
            diff = int(img[row, col] - pred)
            if col < 2:
                vpred[row & 1, col] = img[row, col]
            mag = -diff if diff < 0 else diff
            cat = mag.bit_length()
            if cat >= len(codes):
                raise ValueError(f"diff {diff} needs category {cat}")
            ln, code, _ = codes[cat]
            bw.put(code, ln)
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.put(v, cat)
    return bw.flush()


def _huff_table_bytes():
    """Tag 0x220 payload: u16 header, 12 reserved, starts (u16), lens."""
    dep = len(_CAT_LENS)
    v = (dep - 12) & 15  # decoder computes dep = (v + 12) & 15
    out = struct.pack("<H", v) + b"\x00" * 12
    codes = _codes()
    out += b"".join(struct.pack("<H", c[2]) for c in codes)
    out += bytes(c[0] for c in codes)
    return out


def _build_ifd(entries, next_off=0):
    body = struct.pack("<H", len(entries))
    for tag, typ, count, vb in sorted(entries, key=lambda e: e[0]):
        if isinstance(vb, tuple):
            body += struct.pack("<HHII", tag, typ, count, vb[1])
        else:
            body += struct.pack("<HHI", tag, typ, count) + vb.ljust(
                4, b"\x00")
    body += struct.pack("<I", next_off)
    return body


_PAT_BYTES = {"RGGB": bytes((0, 1, 1, 2)), "GRBG": bytes((1, 0, 2, 1)),
              "GBRG": bytes((1, 2, 0, 1)), "BGGR": bytes((2, 1, 1, 0))}


def write_pef(path, mosaic, bps=12, make="PENTAX", model="SYNTH K",
              iso=200, black_rggb=(64, 65, 66, 63),
              wb_rg1g2b=(8192, 4096, 4096, 6144), pattern="RGGB",
              payload=None):
    """payload: raw bitstream override (hand-built vectors); by default
    the mosaic is encoded with _encode_stream."""
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    assert mosaic.max() < (1 << bps)
    if payload is None:
        payload = _encode_stream(mosaic, bps)

    def u16s(*v):
        return b"".join(struct.pack("<H", int(x)) for x in v)

    def u32s(*v):
        return b"".join(struct.pack("<I", int(x)) for x in v)

    # --- MakerNote ("PENTAX " variant: IFD at +10, offsets relative to
    # the makernote start) ---
    ht = _huff_table_bytes()
    mn_ifd_sz = 2 + 3 * 12 + 4
    bp_off = 10 + mn_ifd_sz
    wp_off = bp_off + 8
    ht_off = wp_off + 8
    # stored BlackPoint/WhitePoint order is R, G1, G2, B
    bp = black_rggb
    mn_ifd = _build_ifd([
        (0x200, 3, 4, ("off", bp_off)),
        (0x201, 3, 4, ("off", wp_off)),
        (0x220, 7, len(ht), ("off", ht_off)),
    ])
    makernote = (b"PENTAX \x00II" + mn_ifd
                 + u16s(*bp) + u16s(*wb_rg1g2b) + ht)
    assert makernote[8:9] == b"I" and len(mn_ifd) == mn_ifd_sz

    # --- main TIFF: IFD0 = raw image + EXIF IFD ---
    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"

    def sz(n):
        return 2 + n * 12 + 4

    ifd0_off = 8
    ifd0_sz = sz(10)
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
    strip_off = heap_off + len(heap)

    ifd0 = _build_ifd([
        (256, 4, 1, u32s(w)),
        (257, 4, 1, u32s(h)),
        (258, 3, 1, u16s(bps)),
        (259, 3, 1, u16s(65535)),
        (271, 2, len(make_b), ("off", make_off)),
        (272, 2, len(model_b), ("off", model_off)),
        (273, 4, 1, u32s(strip_off)),
        (274, 3, 1, u16s(1)),
        (33422, 1, 4, _PAT_BYTES[pattern]),
        (34665, 4, 1, ("off", exif_off)),
    ])
    exif_ifd = _build_ifd([
        (34855, 3, 1, u16s(iso)),
        (0x927C, 7, len(makernote), ("off", mn_off)),
    ])
    out = (struct.pack("<2sHI", b"II", 42, ifd0_off)
           + ifd0 + exif_ifd + heap + payload)
    with open(path, "wb") as f:
        f.write(out)
