"""Synthetic Canon CR2 writer — test oracle for the native CR2 decoder.

Builds a minimal but structurally faithful CR2: little-endian TIFF with the
"CR" magic, IFD0 (Make/Model + EXIF pointer), an EXIF IFD carrying ISO and
a Canon MakerNote (SensorInfo 0x00E0, ColorData 0x4001), and a raw IFD with
a compression-6 lossless-JPEG strip using Canon's vertical slice layout
(tag 0xC640). Mirrors the role io/dngwrite.py plays for DNG.
"""

from __future__ import annotations

import struct

import numpy as np

from art_tpu.io.dngwrite import _BitWriter, _category, _huffman_table


def lj92_encode_comps(img: np.ndarray, precision=14) -> bytes:
    """Encode (H, W, C) uint16 as lossless JPEG (SOF3, C components,
    predictor 1) — each component predicted independently, matching the
    multi-component layout Canon uses."""
    img = np.asarray(img, dtype=np.int64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    default = 1 << (precision - 1)
    diffs = np.zeros((h, w, nc), dtype=np.int64)
    for c in range(nc):
        plane = img[:, :, c]
        ra = np.zeros((h, w), dtype=np.int64)
        ra[0, 0] = default
        ra[0, 1:] = plane[0, :-1]
        ra[1:, 0] = plane[:-1, 0]
        ra[1:, 1:] = plane[1:, :-1]
        diffs[:, :, c] = plane - ra
    diffs = ((diffs + 32768) & 0xFFFF) - 32768
    mags = np.abs(diffs)
    cats = np.where(mags == 0, 0,
                    np.ceil(np.log2(mags + 1)).astype(np.int64))
    cats = np.where(diffs == -32768, 16, cats)
    hist = np.bincount(cats.ravel(), minlength=17)
    codes, bits, huffval = _huffman_table(hist.tolist())

    bw = _BitWriter()
    flat_d = diffs.reshape(-1)
    flat_c = cats.reshape(-1)
    for d, t in zip(flat_d.tolist(), flat_c.tolist()):
        l, code = codes[t]
        bw.put(code, l)
        if t == 16:
            continue
        if t:
            v = d if d >= 0 else d + (1 << t) - 1
            bw.put(v, t)
    scan = bw.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sof += struct.pack(">BBB", c, 0x11, 0)
    dht = bytes([0]) + bytes(bits[1:]) + bytes(huffval)
    sos = struct.pack(">B", nc)
    for c in range(nc):
        sos += struct.pack(">BB", c, 0)
    sos += struct.pack(">BBB", 1, 0, 0)  # Ss=pred 1, Se, Ah/Al
    return (b"\xFF\xD8" + seg(0xC3, sof) + seg(0xC4, dht) + seg(0xDA, sos)
            + scan + b"\xFF\xD9")


def write_cr2(path, mosaic: np.ndarray, n_slices=2, precision=14,
              make="Canon", model="EOS SYNTH", iso=200,
              wb_rggb=(2048, 1024, 1024, 1536),
              sensor_border=(4, 8, None, None), colordata_count=796):
    """Write (H, W) uint16 full-sensor mosaic as a sliced CR2.

    sensor_border: (top, left, bottom, right) of the active area; None
    bottom/right extend to the sensor edge.
    """
    mosaic = np.asarray(mosaic, dtype=np.uint16)
    h, w = mosaic.shape
    top, left, bot, right = sensor_border
    bot = h - 1 if bot is None else bot
    right = w - 1 if right is None else right

    # slice layout: n full slices of width sw + last slice
    if n_slices > 0:
        sw = (w // (n_slices + 1)) & ~1  # even slice widths keep CFA phase
        lw = w - n_slices * sw
    else:
        sw, lw = 0, w
    # build the ljpeg raster: slice-by-slice row-major stream, 2 components
    parts = []
    x0 = 0
    for s in range(n_slices + 1):
        ws = sw if s < n_slices else lw
        parts.append(mosaic[:, x0 : x0 + ws].reshape(-1))
        x0 += ws
    stream = np.concatenate(parts)
    nc = 2
    ljw = w // nc
    lj = stream.reshape(h, ljw, nc)
    payload = lj92_encode_comps(lj, precision=precision)

    # ---- TIFF structure (little-endian, hand-built offsets) ----
    # layout: header(16) | IFD0 | EXIF IFD | MakerNote IFD | values | raw IFD
    #         | strip payload
    def u16s(*v):
        return b"".join(struct.pack("<H", int(x)) for x in v)

    def u32s(*v):
        return b"".join(struct.pack("<I", int(x)) for x in v)

    # --- plan sizes ---
    # MakerNote IFD: SensorInfo (17 SHORT -> heap), ColorData (count SHORT
    # -> heap)
    si = [0] * 17
    si[1], si[2] = w, h
    si[5], si[6], si[7], si[8] = left, top, right, bot
    cd = [0] * colordata_count
    woff = {582: 25, 653: 34}.get(colordata_count, 63)
    cd[woff : woff + 4] = list(wb_rggb)

    # assemble progressively with real offsets: we need total layout.
    # order: IFD0 @16+4.. actually place IFD0 right after header pad.
    # We'll do two passes: first compute with zero offsets, then rebuild.
    def assemble(exif_off, mn_off, raw_ifd_off, strip_off, heap_off):
        heap2 = bytearray()

        def heap_put(b):
            off = heap_off + len(heap2)
            heap2.extend(b)
            return off

        mn_entries = []
        si_off = heap_put(u16s(*si))
        mn_entries.append((0x00E0, 3, 17, ("off", si_off)))
        cd_off = heap_put(u16s(*cd))
        mn_entries.append((0x4001, 3, len(cd), ("off", cd_off)))

        def build(entries, next_off=0):
            body = struct.pack("<H", len(entries))
            for tag, typ, count, vb in sorted(entries, key=lambda e: e[0]):
                if isinstance(vb, tuple):
                    body += struct.pack("<HHII", tag, typ, count, vb[1])
                else:
                    body += struct.pack("<HHI", tag, typ, count) + vb.ljust(
                        4, b"\x00")
            body += struct.pack("<I", next_off)
            return body

        mn_ifd = build(mn_entries)

        exif_entries = [
            (34855, 3, 1, u16s(iso)),  # ISOSpeedRatings
            (0x927C, 7, 8, ("off", mn_off)),  # MakerNote -> points at MN IFD
        ]
        exif_ifd = build(exif_entries)

        make_b = make.encode() + b"\x00"
        model_b = model.encode() + b"\x00"
        ifd0_entries = [
            (271, 2, len(make_b),
             make_b if len(make_b) <= 4 else ("off", heap_put(make_b))),
            (272, 2, len(model_b),
             model_b if len(model_b) <= 4 else ("off", heap_put(model_b))),
            (274, 3, 1, u16s(1)),
            (34665, 4, 1, ("off", exif_off)),  # EXIF IFD
        ]
        ifd0 = build(ifd0_entries, next_off=raw_ifd_off)

        raw_entries = [
            (256, 4, 1, u32s(w)),
            (257, 4, 1, u32s(h)),
            (259, 3, 1, u16s(6)),  # compression 6 (Canon ljpeg)
            (273, 4, 1, u32s(strip_off)),
            (279, 4, 1, u32s(len(payload))),
            (0xC640, 3, 3, ("off", heap_put(u16s(n_slices, sw, lw)))),
        ]
        raw_ifd = build(raw_entries)
        return ifd0, exif_ifd, mn_ifd, raw_ifd, heap2

    # pass 1 with dummy offsets to learn sizes
    a = assemble(0, 0, 0, 0, 0)
    ifd0_sz, exif_sz, mn_sz, raw_sz, heap_sz = (len(x) for x in a)
    base = 16
    ifd0_off = base
    exif_off = ifd0_off + ifd0_sz
    mn_off = exif_off + exif_sz
    raw_ifd_off = mn_off + mn_sz
    heap_off = raw_ifd_off + raw_sz
    strip_off = heap_off + heap_sz
    ifd0, exif_ifd, mn_ifd, raw_ifd, heap2 = assemble(
        exif_off, mn_off, raw_ifd_off, strip_off, heap_off)
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd0_off)
    out += b"CR\x02\x00"
    out += b"\x00" * (16 - len(out))
    out += ifd0 + exif_ifd + mn_ifd + raw_ifd + heap2 + payload
    with open(path, "wb") as f:
        f.write(bytes(out))
