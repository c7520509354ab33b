"""Canon CR3 writer oracle: builds a minimal ISO-BMFF container with one
lossless CRX RAW track (imageLevels=0, encType=0, 4 Bayer subplanes),
bit-exact against the decoder's bitstream model
(canon_cr3_decoder.cc crxDecodeLine/crxDecodeTopLine)."""

from __future__ import annotations

import struct

import numpy as np

JS = [1, 1, 1, 1, 2, 2, 2, 2, 4, 4, 4, 4, 8, 8, 8, 8,
      0x10, 0x10, 0x20, 0x20, 0x40, 0x40, 0x80, 0x80,
      0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000, 0x8000]
J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
     4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, bit):
        self.acc = (self.acc << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.bytes.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def bits(self, value, k):
        for i in range(k - 1, -1, -1):
            self.put((value >> i) & 1)

    def done(self):
        while self.nbits:
            self.put(0)
        return bytes(self.bytes)


def _predict_k(prev_k, bit_code, max_val=15):
    new_k = prev_k - (1 if bit_code < (1 << prev_k >> 1) else 0) \
        + (1 if (bit_code >> prev_k) > 2 else 0) \
        + (1 if (bit_code >> prev_k) > 5 else 0)
    return new_k if (not max_val or new_k < max_val) else max_val


class _State:
    def __init__(self, bw):
        self.bw = bw
        self.k = 0
        self.s = 0

    def code(self, bit_code):
        """Emit one Rice-Golomb code exactly as crx_code reads it."""
        q = bit_code >> self.k if self.k else bit_code
        if q >= 41:
            for _ in range(41):
                self.bw.put(0)
            self.bw.put(1)
            self.bw.bits(bit_code, 21)
        else:
            for _ in range(q):
                self.bw.put(0)
            self.bw.put(1)
            if self.k:
                self.bw.bits(bit_code & ((1 << self.k) - 1), self.k)

    def residual(self, err):
        return 2 * err if err >= 0 else -2 * err - 1

    def run(self, r, remaining):
        """Emit a run of r copies (r >= 1), replicating the decoder's
        JS/J ladder including the no-terminator full-run case."""
        self.bw.put(1)
        n = 1
        if r == remaining:
            while n < r:
                self.bw.put(1)
                n += JS[self.s]
                if n > r:
                    break  # decoder clamps to length
                if self.s < 31:
                    self.s += 1
                if n == r:
                    break
        else:
            while n + JS[self.s] <= r:
                self.bw.put(1)
                n += JS[self.s]
                if self.s < 31:
                    self.s += 1
            self.bw.put(0)
            if J[self.s]:
                self.bw.bits(r - n, J[self.s])
            if self.s > 0:
                self.s -= 1


def encode_subband(values):
    """Encode one (h, w) int32 residual plane (values are the
    median-offset samples, i.e. sample - 2^(nBits-1))."""
    v = np.asarray(values, np.int64)
    h, w = v.shape
    bw = BitWriter()
    st = _State(bw)
    prev = None  # previous line incl. guards [0..w+1]
    for row in range(h):
        line1 = np.zeros(w + 2, np.int64)
        if row == 0:
            st.k = 0
            st.s = 0
            line1[0] = 0
            pos = 1
            length = w
            while length > 1:
                if line1[pos - 1] != 0:
                    pred = line1[pos - 1]
                else:
                    # maximal run of zeros from here
                    r = 0
                    while r < length and v[row, pos - 1 + r] == 0:
                        r += 1
                    if r > 0:
                        st.run(r, length)
                        length -= r
                        for _ in range(r):
                            line1[pos] = line1[pos - 1]
                            pos += 1
                        if length <= 0:
                            break
                    else:
                        bw.put(0)  # no-run flag
                    pred = 0
                val = int(v[row, pos - 1])
                bit_code = st.residual(val - int(pred))
                st.code(bit_code)
                line1[pos] = val
                st.k = _predict_k(st.k, bit_code)
                pos += 1
                length -= 1
            if length == 1:
                pred = line1[pos - 1]
                val = int(v[row, pos - 1])
                bit_code = st.residual(val - int(pred))
                st.code(bit_code)
                line1[pos] = val
                st.k = _predict_k(st.k, bit_code)
                pos += 1
            line1[pos] = line1[pos - 1] + 1
        else:
            line0 = prev
            line1[0] = line0[1]
            p0 = 0
            p1 = 1
            length = w

            def symbol(do_median, not_eol):
                nonlocal p0, p1
                if do_median:
                    delta = int(line0[p0 + 1] - line0[p0])
                    top = int(line0[p0 + 1])
                    left = int(line1[p1 - 1])
                    symb = [delta + left, delta + left, left, top]
                    pred = symb[(((line0[p0] < left) ^ (delta < 0)) << 1)
                                + ((left < top) ^ (delta < 0))]
                else:
                    pred = int(line0[p0 + 1])
                val = int(v[row, p1 - 1])
                bit_code = st.residual(val - pred)
                st.code(bit_code)
                line1[p1] = val
                if not_eol:
                    next_delta = (int(line0[p0 + 2])
                                  - int(line0[p0 + 1])) << 1
                    bit_code = (bit_code + abs(next_delta)) >> 1
                    p0 += 1
                st.k = _predict_k(st.k, bit_code)
                p1 += 1

            while length > 1:
                if line1[p1 - 1] != line0[p0 + 1] \
                        or line1[p1 - 1] != line0[p0 + 2]:
                    symbol(1, 1)
                    length -= 1
                else:
                    # run context: count copies of line1[p1-1]
                    r = 0
                    pv = int(line1[p1 - 1])
                    while r < length and v[row, p1 - 1 + r] == pv:
                        r += 1
                    if r > 0:
                        st.run(r, length)
                        length -= r
                        p0 += r
                        for _ in range(r):
                            line1[p1] = line1[p1 - 1]
                            p1 += 1
                    else:
                        bw.put(0)
                    if length > 0:
                        symbol(0, 1 if length > 1 else 0)
                        length -= 1
            if length == 1:
                symbol(1, 0)
            line1[p1] = line1[p1 - 1] + 1
        prev = line1
    return bw.done()


def _box(name, payload):
    return struct.pack(">I", 8 + len(payload)) + name + payload


def write_cr3(path, mosaic, n_bits=12, cfa_layout=0, make=b"Canon",
              model=b"Canon EOS R-TEST", wb=(2.0, 1.0, 1.5),
              colordata_count=1560):
    """Write a lossless CR3. mosaic: (H, W) uint16 full Bayer mosaic
    with even dims; cfa_layout 0 = RGGB."""
    mosaic = np.asarray(mosaic, np.uint16)
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0
    ph, pw = h // 2, w // 2
    median = 1 << (n_bits - 1)

    # plane i lands at position base[i] per cfaLayout
    # (crxSetupImageData outBufs): extract each subplane accordingly
    pos = {0: [(0, 0), (0, 1), (1, 0), (1, 1)],
           1: [(0, 1), (0, 0), (1, 1), (1, 0)],
           2: [(1, 0), (1, 1), (0, 0), (0, 1)],
           3: [(1, 1), (1, 0), (0, 1), (0, 0)]}[cfa_layout]
    planes = [mosaic[dy::2, dx::2] for dy, dx in pos]
    streams = [encode_subband(p.astype(np.int64) - median) for p in planes]

    # mdat header: FF01 tile + 4 x (FF02 + FF03)
    tile_size = sum(len(s) for s in streams)
    hdr = struct.pack(">HHIHH", 0xFF01, 8, tile_size, 0, 0)
    for ci, s in enumerate(streams):
        hdr += struct.pack(">HHI", 0xFF02, 8, len(s)) \
            + bytes([ci << 4 | 8, 0, 0, 0])
        bit_data = 0x8000000  # supportsPartial, qParam 0, tail 0
        hdr += struct.pack(">HHII", 0xFF03, 8, len(s), bit_data)
    mdat_payload = hdr + b"".join(streams)

    # CMP1: 4 flag bytes + 36-byte header
    cmp1 = struct.pack(">I", 0)
    cmp1 += struct.pack(">HH", 0x100, 0)          # +4 version, +6 reserved
    cmp1 += struct.pack(">II", w, h)              # +8 f_width/f_height
    cmp1 += struct.pack(">II", w, h)              # +16 tile dims
    cmp1 += bytes([n_bits, (4 << 4) | cfa_layout, 0, 0])  # +24
    cmp1 += struct.pack(">I", len(hdr))           # +28 mdatHdrSize
    cmp1 += b"\0" * 4
    cmp1_box = _box(b"CMP1", cmp1)

    craw = b"\0" * 82 + cmp1_box
    stsd = struct.pack(">II", 0, 1) + _box(b"CRAW", craw)
    hdlr = struct.pack(">II", 0, 0) + b"vide" + b"\0" * 12

    # stsz (uniform size) + co64 (patched after layout)
    stsz = struct.pack(">III", 0, len(mdat_payload), 1)

    def tiff_ifd(entries, extra=b"", base=8):
        """little-endian TIFF with one IFD; offsets relative to buffer."""
        n = len(entries)
        data_off = base + 2 + 12 * n + 4
        out = b"II*\0" + struct.pack("<I", base)
        body = struct.pack("<H", n)
        blob = b""
        for tag, typ, cnt, val in entries:
            if isinstance(val, bytes):
                if len(val) <= 4:
                    body += struct.pack("<HHI", tag, typ, cnt) \
                        + val.ljust(4, b"\0")
                else:
                    body += struct.pack("<HHII", tag, typ, cnt,
                                        data_off + len(blob))
                    blob += val
            else:
                body += struct.pack("<HHII", tag, typ, cnt, val)
        body += b"\0" * 4
        return out + body + blob + extra

    cmt1 = tiff_ifd([
        (271, 2, len(make) + 1, make + b"\0"),
        (272, 2, len(model) + 1, model + b"\0"),
        (274, 3, 1, 1),
    ])
    # CMT3 = makernote IFD: SensorInfo + ColorData
    sensor_info = struct.pack("<9H", 9, w, h, 0, 0, 0, 0, w - 1, h - 1)
    woff = {582: 25, 653: 34, 1560: 63, 1820: 71, 2024: 85}.get(
        colordata_count, 63)
    cd = [0] * colordata_count
    g = 1024.0
    cd[woff:woff + 4] = [int(g * wb[0]), int(g), int(g), int(g * wb[2])]
    colordata = struct.pack(f"<{colordata_count}H", *cd)
    cmt3 = tiff_ifd([
        (0x00E0, 3, 9, sensor_info),
        (0x4001, 3, colordata_count, colordata),
    ])
    cmt2 = tiff_ifd([(34855, 3, 1, 800)])

    uuid_canon = bytes([0x85, 0xc0, 0xb6, 0x87, 0x82, 0x0f, 0x11, 0xe0,
                        0x81, 0x11, 0xf4, 0xce, 0x46, 0x2b, 0x6a, 0x48])
    uuid_box = _box(b"uuid", uuid_canon + _box(b"CMT1", cmt1)
                    + _box(b"CMT2", cmt2) + _box(b"CMT3", cmt3))

    # assemble with a co64 placeholder, then patch the absolute offset
    def moov_with(co64_off):
        co64 = struct.pack(">IIQ", 0, 1, co64_off)
        stbl = _box(b"stsd", stsd) + _box(b"stsz", stsz) \
            + _box(b"co64", co64)
        minf = _box(b"stbl", stbl)
        mdia = _box(b"hdlr", hdlr) + _box(b"minf", minf)
        trak = _box(b"mdia", mdia)
        return _box(b"moov", _box(b"trak", trak) + uuid_box)

    ftyp = _box(b"ftyp", b"crx " + struct.pack(">I", 1) + b"crx isom")
    moov0 = moov_with(0)
    mdat_off = len(ftyp) + len(moov0) + 8  # mdat payload offset
    moov = moov_with(mdat_off)
    assert len(moov) == len(moov0)
    blob = ftyp + moov + _box(b"mdat", mdat_payload)
    with open(path, "wb") as f:
        f.write(blob)
    return str(path)
