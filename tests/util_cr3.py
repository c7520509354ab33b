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


def encode_subband_noref(values):
    """Encode one (h, w) int32 coefficient plane with the non-progressive
    ("no ref prev line") coder used by all wavelet detail bands and
    non-partial LL bands (crxDecodeTopLineNoRefPrevLine /
    crxDecodeLineNoRefPrevLine): pure residuals, zero-run coding, a
    per-column K history that persists across rows."""
    v = np.asarray(values, np.int64)
    h, w = v.shape
    bw = BitWriter()
    st = _State(bw)
    kbuf = [0] * (w + 1)
    prev = None
    for row in range(h):
        line1 = [0] * (w + 2)
        if row == 0:
            st.k = 0
            st.s = 0
            length = w
            pos = 1
            while length > 1:
                if line1[pos - 1] != 0:
                    val = int(v[row, pos - 1])
                    bc = st.residual(val)
                    st.code(bc)
                    line1[pos] = val
                    st.k = _predict_k(st.k, bc, 15)
                else:
                    r = 0
                    while r < length and v[row, pos - 1 + r] == 0:
                        r += 1
                    if r > 0:
                        st.run(r, length)
                        length -= r
                        for _ in range(r):
                            line1[pos] = 0
                            kbuf[pos - 1] = 0
                            pos += 1
                        if length <= 0:
                            break
                    else:
                        bw.put(0)
                    val = int(v[row, pos - 1])  # nonzero by construction
                    bc = st.residual(val) - 1   # decoder: zigzag(code + 1)
                    st.code(bc)
                    line1[pos] = val
                    st.k = _predict_k(st.k, bc, 15)
                kbuf[pos - 1] = st.k
                pos += 1
                length -= 1
            if length == 1:
                val = int(v[row, pos - 1])
                bc = st.residual(val)
                st.code(bc)
                line1[pos] = val
                st.k = _predict_k(st.k, bc, 15)
                kbuf[pos - 1] = st.k
        else:
            line0 = prev
            i = 0
            while i < w - 1:
                if line0[i + 2] or line0[i + 1] or line1[i]:
                    val = int(v[row, i])
                    bc = st.residual(val)
                    st.code(bc)
                    line1[i + 1] = val
                    st.k = _predict_k(st.k, bc, 0)
                    if kbuf[i + 1] - st.k <= 1:
                        if st.k >= 15:
                            st.k = 15
                    else:
                        st.k += 1
                    kbuf[i] = st.k
                    i += 1
                    continue
                r = 0
                while i + r < w and v[row, i + r] == 0:
                    r += 1
                if r > 0:
                    st.run(r, w - i)
                    for _ in range(r):
                        line1[i + 1] = 0
                        kbuf[i] = 0
                        i += 1
                else:
                    bw.put(0)
                if i >= w - 1:
                    if i == w - 1:
                        val = int(v[row, i])
                        bc = st.residual(val) - 1
                        st.code(bc)
                        line1[i + 1] = val
                        st.k = _predict_k(st.k, bc, 15)
                        kbuf[i] = st.k
                        i += 1
                    continue
                val = int(v[row, i])
                bc = st.residual(val) - 1
                st.code(bc)
                line1[i + 1] = val
                st.k = _predict_k(st.k, bc, 0)
                if kbuf[i + 1] - st.k <= 1:
                    if st.k >= 15:
                        st.k = 15
                else:
                    st.k += 1
                kbuf[i] = st.k
                i += 1
            if i == w - 1:
                val = int(v[row, i])
                bc = st.residual(val)
                st.code(bc)
                line1[i + 1] = val
                st.k = _predict_k(st.k, bc, 15)
                kbuf[i] = st.k
        prev = line1
    return bw.done()


# ---------------------------------------------------------------------------
# Integer LeGall 5/3 lifting (the CRX wavelet), exact inverse pair of the
# decoder's synthesis (crxHorizontal53 / the vertical analog). Single-tile
# (symmetric extension) form.
# ---------------------------------------------------------------------------

def dwt53_1d(x):
    """Forward split: returns (lo, hi) with len(lo)=ceil(n/2)."""
    x = [int(t) for t in x]
    n = len(x)
    if n == 1:
        return [x[0]], []
    nh, nl = n // 2, (n + 1) // 2
    hi = [0] * nh
    for j in range(nh):
        if 2 * j + 2 < n:
            hi[j] = x[2 * j + 1] - ((x[2 * j] + x[2 * j + 2]) >> 1)
        else:  # even n: last odd sample pairs with its left neighbour only
            hi[j] = x[n - 1] - x[n - 2]
    lo = [0] * nl
    lo[0] = x[0] + ((hi[0] + 1) >> 1)
    for i in range(1, nl):
        if 2 * i == n - 1:  # odd n: trailing even sample
            lo[i] = x[n - 1] + ((hi[nh - 1] + 1) >> 1)
        else:
            lo[i] = x[2 * i] + ((hi[i - 1] + hi[i] + 2) >> 2)
    return lo, hi


def idwt53_1d(lo, hi, n):
    """Synthesis; mirrors the decoder arithmetic exactly."""
    out = [0] * n
    if n == 1:
        out[0] = lo[0]
        return out
    out[0] = lo[0] - ((hi[0] + 1) >> 1)
    li, hj, o = 1, 0, 0
    for _ in range(0, n - 3, 2):
        delta = lo[li] - ((hi[hj] + hi[hj + 1] + 2) >> 2)
        out[o + 1] = hi[hj] + ((delta + out[o]) >> 1)
        out[o + 2] = delta
        li += 1
        hj += 1
        o += 2
    if n & 1:
        delta = lo[li] - ((hi[hj] + 1) >> 1)
        out[o + 1] = hi[hj] + ((delta + out[o]) >> 1)
        out[o + 2] = delta
    else:
        out[o + 1] = out[o] + hi[hj]
    return out


def dwt2d(x):
    """One analysis level: vertical split, then horizontal on each row.
    Returns (LL, HL, LH, HH) int64 arrays (subbands 0..3 order)."""
    x = np.asarray(x, np.int64)
    h, w = x.shape
    nlr, nhr = (h + 1) // 2, h // 2
    L = np.zeros((nlr, w), np.int64)
    H = np.zeros((nhr, w), np.int64)
    for c in range(w):
        lo, hi = dwt53_1d(x[:, c])
        L[:, c] = lo
        H[:, c] = hi
    nlc, nhc = (w + 1) // 2, w // 2
    LL = np.zeros((nlr, nlc), np.int64)
    HL = np.zeros((nlr, nhc), np.int64)
    LH = np.zeros((nhr, nlc), np.int64)
    HH = np.zeros((nhr, nhc), np.int64)
    for r in range(nlr):
        lo, hi = dwt53_1d(L[r])
        LL[r], HL[r] = lo, hi
    for r in range(nhr):
        lo, hi = dwt53_1d(H[r])
        LH[r], HH[r] = lo, hi
    return LL, HL, LH, HH


def idwt2d(LL, HL, LH, HH, h, w):
    """One synthesis level to an (h, w) plane (decoder order: horizontal
    per row pair, then vertical)."""
    nlr, nhr = (h + 1) // 2, h // 2
    low = np.zeros((nlr, w), np.int64)
    high = np.zeros((nhr, w), np.int64)
    for r in range(nlr):
        low[r] = idwt53_1d(list(LL[r]), list(HL[r]), w)
    for r in range(nhr):
        high[r] = idwt53_1d(list(LH[r]), list(HH[r]), w)
    out = np.zeros((h, w), np.int64)
    for c in range(w):
        lo = list(low[:, c])
        hi = list(high[:, c])
        out[:, c] = idwt53_1d(lo, hi, h)
    return out


def dwt2d_multi(x, levels):
    """bands[0]=LL coarsest, then per level (coarsest first) HL, LH, HH."""
    bands = [None] * (3 * levels + 1)
    cur = np.asarray(x, np.int64)
    for lv in range(levels - 1, -1, -1):
        LL, HL, LH, HH = dwt2d(cur)
        bands[3 * lv + 1] = HL
        bands[3 * lv + 2] = LH
        bands[3 * lv + 3] = HH
        cur = LL
    bands[0] = cur
    return bands


def idwt2d_multi(bands, levels, h, w):
    dims = [(h, w)]
    for _ in range(levels - 1):
        ph, pw = dims[-1]
        dims.append(((ph + 1) // 2, (pw + 1) // 2))
    dims.reverse()  # coarsest first
    cur = bands[0]
    for lv in range(levels):
        oh, ow = dims[lv]
        cur = idwt2d(cur, bands[3 * lv + 1], bands[3 * lv + 2],
                     bands[3 * lv + 3], oh, ow)
    return cur


def crx_qscale(q_param):
    tbl = [0x28, 0x2D, 0x33, 0x39, 0x40, 0x48]
    if q_param // 6 >= 6:
        return tbl[q_param % 6] * (1 << (q_param // 6 + 26))
    return tbl[q_param % 6] >> (6 - q_param // 6)


def _box(name, payload):
    return struct.pack(">I", 8 + len(payload)) + name + payload


def _subplanes(mosaic, cfa_layout):
    # plane i lands at position base[i] per cfaLayout
    # (crxSetupImageData outBufs): extract each subplane accordingly
    pos = {0: [(0, 0), (0, 1), (1, 0), (1, 1)],
           1: [(0, 1), (0, 0), (1, 1), (1, 0)],
           2: [(1, 0), (1, 1), (0, 0), (0, 1)],
           3: [(1, 1), (1, 0), (0, 1), (0, 0)]}[cfa_layout]
    return [mosaic[dy::2, dx::2] for dy, dx in pos]


def write_cr3(path, mosaic, n_bits=12, cfa_layout=0, make=b"Canon",
              model=b"Canon EOS R-TEST", wb=(2.0, 1.0, 1.5),
              colordata_count=1560):
    """Write a lossless CR3. mosaic: (H, W) uint16 full Bayer mosaic
    with even dims; cfa_layout 0 = RGGB."""
    mosaic = np.asarray(mosaic, np.uint16)
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0
    median = 1 << (n_bits - 1)

    planes = _subplanes(mosaic, cfa_layout)
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
    return _assemble_cr3(path, mdat_payload, len(hdr), w, h, n_bits,
                         cfa_layout, 0, make, model, wb, colordata_count)


def write_cr3_lossy(path, mosaic, n_bits=12, levels=3, q_param=4,
                    cfa_layout=0, supports_partial=True, make=b"Canon",
                    model=b"Canon EOS R-TEST", wb=(2.0, 1.0, 1.5),
                    colordata_count=1560):
    """Write a lossy (wavelet cRAW profile) CR3: per subplane a
    `levels`-deep 5/3 decomposition, coefficients quantized by the
    v0x100 scalar qScale and Rice-coded per band. Returns (path,
    expected_mosaic) — expected is the exact decoder reconstruction."""
    mosaic = np.asarray(mosaic, np.uint16)
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0
    median = 1 << (n_bits - 1)
    max_val = (1 << n_bits) - 1
    qs = crx_qscale(q_param)
    assert qs >= 1

    planes = _subplanes(mosaic, cfa_layout)
    ph, pw = planes[0].shape
    comp_streams = []
    expected = np.zeros_like(mosaic)
    pos = {0: [(0, 0), (0, 1), (1, 0), (1, 1)],
           1: [(0, 1), (0, 0), (1, 1), (1, 0)],
           2: [(1, 0), (1, 1), (0, 0), (0, 1)],
           3: [(1, 1), (1, 0), (0, 1), (0, 0)]}[cfa_layout]
    for ci, p in enumerate(planes):
        bands = dwt2d_multi(p.astype(np.int64) - median, levels)
        sent = [np.round(b / qs).astype(np.int64) for b in bands]
        streams = []
        for bi, b in enumerate(sent):
            if supports_partial and bi == 0:
                streams.append(encode_subband(b))
            else:
                streams.append(encode_subband_noref(b))
        comp_streams.append(streams)
        recon = idwt2d_multi([b * qs for b in sent], levels, ph, pw)
        dy, dx = pos[ci]
        expected[dy::2, dx::2] = np.clip(median + recon, 0, max_val) \
            .astype(np.uint16)

    # mdat header: FF01 tile + per comp FF02 + (3*levels+1) FF03s
    tile_size = sum(len(s) for st in comp_streams for s in st)
    hdr = struct.pack(">HHIHH", 0xFF01, 8, tile_size, 0, 0)
    for ci, streams in enumerate(comp_streams):
        comp_size = sum(len(s) for s in streams)
        partial_bit = 8 if supports_partial else 0
        hdr += struct.pack(">HHI", 0xFF02, 8, comp_size) \
            + bytes([ci << 4 | partial_bit, 0, 0, 0])
        for bi, s in enumerate(streams):
            # bitData: bandIdx<<28 | partial<<27 | qParam<<19 | tail(0)
            bit_data = (bi << 28) | (q_param << 19)
            hdr += struct.pack(">HHII", 0xFF03, 8, len(s), bit_data)
    mdat_payload = hdr + b"".join(s for st in comp_streams for s in st)
    _assemble_cr3(path, mdat_payload, len(hdr), w, h, n_bits, cfa_layout,
                  levels, make, model, wb, colordata_count)
    return str(path), expected


def _assemble_cr3(path, mdat_payload, hdr_len, w, h, n_bits, cfa_layout,
                  levels, make, model, wb, colordata_count):
    # CMP1: 4 flag bytes + 36-byte header
    cmp1 = struct.pack(">I", 0)
    cmp1 += struct.pack(">HH", 0x100, 0)          # +4 version, +6 reserved
    cmp1 += struct.pack(">II", w, h)              # +8 f_width/f_height
    cmp1 += struct.pack(">II", w, h)              # +16 tile dims
    cmp1 += bytes([n_bits, (4 << 4) | cfa_layout, levels, 0])  # +24
    cmp1 += struct.pack(">I", hdr_len)            # +28 mdatHdrSize
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
