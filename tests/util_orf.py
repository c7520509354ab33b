"""Synthetic Olympus ORF writer — test oracle for the native ORF decoder.

Builds an ORF: TIFF with the "IIRO" magic whose IFD0 is the raw image,
an EXIF IFD carrying ISO and a new-style "OLYMPUS" MakerNote with the
0x2040 ImageProcessing sub-IFD (WB tag 0x0100, black tag 0x0600), and
the MSB-first carry-adaptive bitstream of (sign+low, unary high, nbits
magnitude) codes with the two-back gradient predictor
(reference behavior: dcraw.cc olympus_load_raw :2684)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_nef import _BitWriter
from tests.util_pef import _PAT_BYTES, _build_ifd


def _encode_stream(mosaic):
    """Lossless olympus bitstream for a (h, w) uint16 mosaic (<4096)."""
    img = np.asarray(mosaic, np.int64)
    h, w = img.shape
    bw = _BitWriter()
    for row in range(h):
        carry = [[0, 0, 0], [0, 0, 0]]
        for col in range(w):
            c = carry[col & 1]
            i = 2 if c[2] < 3 else 0
            nbits = 2 + i
            while (c[0] & 0xFFFF) >> (nbits + i):
                nbits += 1
            # predictor (decoder's gradient rules)
            if row < 2 and col < 2:
                pred = 0
            elif row < 2:
                pred = int(img[row, col - 2])
            elif col < 2:
                pred = int(img[row - 2, col])
            else:
                pw = int(img[row, col - 2])
                pn = int(img[row - 2, col])
                nw = int(img[row - 2, col - 2])
                if (pw < nw < pn) or (pn < nw < pw):
                    if abs(pw - nw) > 32 or abs(pn - nw) > 32:
                        pred = pw + pn - nw
                    else:
                        pred = (pw + pn) >> 1
                else:
                    pred = pw if abs(pw - nw) > abs(pn - nw) else pn
            resid = int(img[row, col]) - pred
            low = resid & 3
            diff = resid >> 2
            t = diff - c[1]
            if t >= 0:
                signbit, c0 = 0, t
            else:
                signbit, c0 = 1, -t - 1  # decoder: diff = (~c0) + c1
            high = c0 >> nbits
            lowbits = c0 & ((1 << nbits) - 1)
            bw.put(signbit << 2 | low, 3)
            if high < 12:
                bw.put(1, high + 1)  # high zeros then a one
            else:
                assert high < (1 << (15 - nbits)), "value out of range"
                bw.put(0, 12)
                bw.put(high << 1, 16 - nbits)
            bw.put(lowbits, nbits)
            c[0] = c0
            c[1] = (diff * 3 + c[1]) >> 5
            c[2] = 0 if c0 > 16 else c[2] + 1
    return bw.flush()


def write_orf(path, mosaic, compressed=True, make="OLYMPUS CORPORATION",
              model="E-M1SYNTH", iso=200, black_rg1bg2=(255, 256, 254, 257),
              wb_rb=(2.25, 1.5), pattern="RGGB", payload=None):
    """mosaic: (h, w) uint16; compressed=False writes the 16-bit
    unpacked variant. payload overrides the bitstream (hand vectors)."""
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    if payload is None:
        if compressed:
            assert mosaic.max() < 4096
            # 7 opaque header bytes precede the bitstream
            payload = b"\x00" * 7 + _encode_stream(mosaic)
        else:
            payload = mosaic.astype("<u2").tobytes()

    def u16s(*v):
        return b"".join(struct.pack("<H", int(x)) for x in v)

    def u32s(*v):
        return b"".join(struct.pack("<I", int(x)) for x in v)

    # --- MakerNote (new-style: "OLYMPUS\0II\x03\0", IFD at +12,
    # offsets relative to the note start) ---
    mn_ifd_sz = 2 + 1 * 12 + 4
    ip_off = 12 + mn_ifd_sz          # 0x2040 sub-IFD, note-relative
    ip_ifd_sz = 2 + 2 * 12 + 4
    blk_off = ip_off + ip_ifd_sz     # 0x0600 payload
    ip_ifd = _build_ifd([
        (0x0100, 3, 2, u16s(int(wb_rb[0] * 256), int(wb_rb[1] * 256))),
        (0x0600, 3, 4, ("off", blk_off)),
    ])
    mn_ifd = _build_ifd([(0x2040, 4, 1, u32s(ip_off))])
    makernote = (b"OLYMPUS\x00II\x03\x00" + mn_ifd + ip_ifd
                 + u16s(*black_rg1bg2))
    assert len(mn_ifd) == mn_ifd_sz and len(ip_ifd) == ip_ifd_sz

    # --- main TIFF ("IIRO" magic): IFD0 = raw image + EXIF IFD ---
    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"

    def sz(n):
        return 2 + n * 12 + 4

    ifd0_off = 8
    ifd0_sz = sz(11)
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
        (258, 3, 1, u16s(12 if compressed else 16)),
        (259, 3, 1, u16s(1)),
        (262, 3, 1, u16s(32803)),
        (271, 2, len(make_b), ("off", make_off)),
        (272, 2, len(model_b), ("off", model_off)),
        (273, 4, 1, u32s(strip_off)),
        (279, 4, 1, u32s(len(payload))),
        (33422, 1, 4, _PAT_BYTES[pattern]),
        (34665, 4, 1, ("off", exif_off)),
    ])
    exif_ifd = _build_ifd([
        (34855, 3, 1, u16s(iso)),
        (0x927C, 7, len(makernote), ("off", mn_off)),
    ])
    out = (struct.pack("<2s2sI", b"II", b"RO", ifd0_off)
           + ifd0 + exif_ifd + heap + payload)
    with open(path, "wb") as f:
        f.write(out)
    return str(path)
