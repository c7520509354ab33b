"""Fuji lossless-compressed RAF writer — test oracle for the native decoder.

Mirror-image *encoder* for the bitstream model implemented by
art_tpu/io/native/artraw.cc (reference decode boundary:
rtengine/fujicompressed.cc): per-768-column strips, per-color sliding line
buffers (5 R / 8 G / 5 B), adaptive Golomb coding with 41
quantized-gradient contexts per parity, and the fixed 6-pass schedule in
which some X-Trans even lanes are interpolated instead of coded.

The encoder runs the exact decoder recurrence and, at each coded sample,
emits the code that makes the decoder reconstruct the target value.  Lanes
the schedule interpolates are deterministic, so the returned "achievable"
mosaic (what a decoder must produce) can differ from the input at those
positions; tests assert decode(file) == achievable.
"""

from __future__ import annotations

import struct

import numpy as np

Q1, Q2, Q3 = 0x12, 0x43, 0x114
MIN_VALUE = 0x40  # context count at which accumulators halve

# line-buffer indices: 5 red, 8 green, 5 blue sliding lines
FL_R, FL_G, FL_B, FL_TOTAL = 0, 5, 13, 18

# the six passes: (line_a, line_b, gradient set, even-mode a, even-mode b)
# even modes: "s" coded, "i" interpolated, "i0" interp when pos%4==0,
# "i2" interp when pos%4==2
PASSES_XTRANS = [
    (FL_R + 2, FL_G + 2, 0, "i", "s"),
    (FL_G + 3, FL_B + 2, 1, "s", "i"),
    (FL_R + 3, FL_G + 4, 2, "i0", "i"),
    (FL_G + 5, FL_B + 3, 0, "s", "i2"),
    (FL_R + 4, FL_G + 6, 1, "i2", "s"),
    (FL_G + 7, FL_B + 4, 2, "i", "i0"),
]
PASSES_BAYER = [
    (FL_R + 2, FL_G + 2, 0, "s", "s"),
    (FL_G + 3, FL_B + 2, 1, "s", "s"),
    (FL_R + 3, FL_G + 4, 2, "s", "s"),
    (FL_G + 5, FL_B + 3, 0, "s", "s"),
    (FL_R + 4, FL_G + 6, 1, "s", "s"),
    (FL_G + 7, FL_B + 4, 2, "s", "s"),
]

# canonical X-Trans pattern (absolute orientation)
XTRANS_ABS = [
    [1, 1, 0, 1, 1, 2],
    [1, 1, 2, 1, 1, 0],
    [2, 0, 1, 0, 2, 1],
    [1, 1, 2, 1, 1, 0],
    [1, 1, 0, 1, 1, 2],
    [0, 2, 1, 2, 0, 1],
]


def _qlevel(d):
    a = abs(d)
    if d == 0:
        return 0
    lv = 1 if a < Q1 else 2 if a < Q2 else 3 if a < Q3 else 4
    return lv if d > 0 else -lv


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, bit):
        self.acc = self.acc << 1 | bit
        self.nbits += 1
        if self.nbits == 8:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def put_bits(self, value, k):
        for i in range(k - 1, -1, -1):
            self.put((value >> i) & 1)

    def finish(self):
        while self.nbits:
            self.put(0)
        return bytes(self.out)


class _Grad:
    __slots__ = ("v1", "v2")

    def __init__(self, v1, v2):
        self.v1 = v1
        self.v2 = v2


class _StripEncoder:
    """Encodes one 768-wide strip; state mirrors the decoder exactly."""

    def __init__(self, bits, xtrans_mode, line_width):
        self.bits = bits
        self.total = 1 << bits
        self.qmax = self.total - 1
        self.escape_at = 3 * bits - 1
        self.lw = line_width
        self.w = _BitWriter()
        self.lines = [[0] * (line_width + 2) for _ in range(FL_TOTAL)]
        base = self.total >> 6
        self.grad_even = [[_Grad(base, 1) for _ in range(41)] for _ in range(3)]
        self.grad_odd = [[_Grad(base, 1) for _ in range(41)] for _ in range(3)]
        self.passes = PASSES_XTRANS if xtrans_mode else PASSES_BAYER
        # targets[li][pos] = desired decoded value or None
        self.targets = [[None] * line_width for _ in range(FL_TOTAL)]

    def _clampq(self, v):
        return -self.qmax if v < -self.qmax else (self.qmax if v > self.qmax else v)

    def _quant_grad(self, v1, v2):
        return 9 * _qlevel(self._clampq(v1)) + _qlevel(self._clampq(v2))

    def _code_bits(self, g):
        k = 0
        if g.v1 > g.v2:
            while k <= 12:
                k += 1
                if not (g.v2 << k) < g.v1:
                    break
        return k

    def _encode_code(self, g, mag):
        k = self._code_bits(g)
        code = 2 * mag if mag >= 0 else -2 * mag - 1
        high = code >> k
        if high < self.escape_at:
            for _ in range(high):
                self.w.put(0)
            self.w.put(1)
            self.w.put_bits(code & ((1 << k) - 1), k)
        else:
            for _ in range(self.escape_at):
                self.w.put(0)
            self.w.put(1)
            self.w.put_bits(code - 1, self.bits)
        g.v1 += abs(mag)
        if g.v2 == MIN_VALUE:
            g.v1 >>= 1
            g.v2 >>= 1
        g.v2 += 1

    def _store(self, li, pos, val):
        if val < 0:
            val += self.total
        elif val > self.qmax:
            val -= self.total
        self.lines[li][1 + pos] = 0 if val < 0 else min(val, self.qmax)

    def _wrap_delta(self, delta):
        delta %= self.total
        if delta > self.total // 2:
            delta -= self.total
        return delta

    def _even(self, li, pos, grads):
        up, up2 = self.lines[li - 1], self.lines[li - 2]
        b, c, d, f = up[1 + pos], up[pos], up[2 + pos], up2[1 + pos]
        grad = self._quant_grad(b - f, c - b)
        db, df, dd = abs(c - b), abs(f - b), abs(d - b)
        if db > df and db > dd:
            pred = f + d + 2 * b
        elif dd > db and dd > df:
            pred = f + c + 2 * b
        else:
            pred = d + c + 2 * b
        base = pred >> 2
        t = self.targets[li][pos]
        delta = 0 if t is None else self._wrap_delta(t - base)
        mag = -delta if grad < 0 else delta
        self._encode_code(grads[abs(grad)], mag)
        self._store(li, pos, base + delta)

    def _odd(self, li, pos, grads):
        cur, up = self.lines[li], self.lines[li - 1]
        a, b, c, d, gg = cur[pos], up[1 + pos], up[pos], up[2 + pos], cur[2 + pos]
        grad = self._quant_grad(b - c, c - a)
        if (b > c and b > d) or (b < c and b < d):
            base = (gg + a + 2 * b) >> 2
        else:
            base = (a + gg) >> 1
        t = self.targets[li][pos]
        delta = 0 if t is None else self._wrap_delta(t - base)
        mag = -delta if grad < 0 else delta
        self._encode_code(grads[abs(grad)], mag)
        self._store(li, pos, base + delta)

    def _interp_even(self, li, pos):
        cur, up, up2 = self.lines[li], self.lines[li - 1], self.lines[li - 2]
        b, c, d, f = up[1 + pos], up[pos], up[2 + pos], up2[1 + pos]
        db, df, dd = abs(c - b), abs(f - b), abs(d - b)
        if db > df and db > dd:
            cur[1 + pos] = (f + d + 2 * b) >> 2
        elif dd > db and dd > df:
            cur[1 + pos] = (f + c + 2 * b) >> 2
        else:
            cur[1 + pos] = (d + c + 2 * b) >> 2

    def _even_step(self, li, pos, mode, grads):
        interp = (mode == "i" or (mode == "i0" and pos % 4 == 0)
                  or (mode == "i2" and pos % 4 == 2))
        if interp:
            self._interp_even(li, pos)
        else:
            self._even(li, pos, grads)

    def _extend(self, first, last):
        for i in range(first, last + 1):
            self.lines[i][0] = self.lines[i - 1][1]
            self.lines[i][self.lw + 1] = self.lines[i - 1][self.lw]

    def run_group(self):
        for la, lb, gs, ma, mb in self.passes:
            even, odd = 0, 1
            while even < self.lw or odd < self.lw:
                if even < self.lw:
                    self._even_step(la, even, ma, self.grad_even[gs])
                    self._even_step(lb, even, mb, self.grad_even[gs])
                    even += 2
                if even > 8:
                    self._odd(la, odd, self.grad_odd[gs])
                    self._odd(lb, odd, self.grad_odd[gs])
                    odd += 2
            if la < FL_G:
                self._extend(FL_R + 2, FL_R + 4)
                self._extend(FL_G + 2, FL_G + 7)
            else:
                self._extend(FL_G + 2, FL_G + 7)
                self._extend(FL_B + 2, FL_B + 4)

    def slide(self):
        lw2 = self.lw + 2
        for dst, src in ((FL_R, FL_R + 3), (FL_R + 1, FL_R + 4),
                         (FL_G, FL_G + 6), (FL_G + 1, FL_G + 7),
                         (FL_B, FL_B + 3), (FL_B + 1, FL_B + 4)):
            self.lines[dst] = list(self.lines[src])
        for first, count in ((FL_R + 2, 3), (FL_G + 2, 6), (FL_B + 2, 3)):
            for i in range(first, first + count):
                self.lines[i] = [0] * lw2
            self.lines[first][0] = self.lines[first - 1][1]
            self.lines[first][self.lw + 1] = self.lines[first - 1][self.lw]


def _lane(color, rr, p, xtrans_mode):
    """(line index, sample index) for output pixel (rr, p) of one group."""
    if xtrans_mode:
        idx = (((p * 2 // 3) & ~1) | (p % 3 & 1)) + ((p % 3) >> 1)
    else:
        idx = p >> 1
    if color == 0:
        li = FL_R + 2 + (rr >> 1)
    elif color == 2:
        li = FL_B + 2 + (rr >> 1)
    else:
        li = FL_G + 2 + rr
    return li, idx


def encode_fuji_compressed(mosaic, bits, xtrans=None, bayer2x2=(0, 1, 1, 2)):
    """Encode a mosaic; returns (stream bytes, achievable mosaic)."""
    mosaic = np.asarray(mosaic, dtype=np.int64)
    h, w = mosaic.shape
    assert h % 6 == 0 and w % 24 == 0 and w >= 0x300
    bw = 0x300
    blocks = (w + bw - 1) // bw
    rounded = blocks * bw
    xmode = xtrans is not None
    lw = bw * 2 // 3 if xmode else bw // 2
    xflat = ([int(xtrans[r][c]) for r in range(6) for c in range(6)]
             if xmode else None)
    total_lines = h // 6
    achievable = np.zeros((h, w), dtype=np.uint16)

    streams = []
    for blk in range(blocks):
        col0 = blk * bw
        ncols = min(bw, w - col0)
        enc = _StripEncoder(bits, xmode, lw)
        for ln in range(total_lines):
            enc.targets = [[None] * lw for _ in range(FL_TOTAL)]
            for rr in range(6):
                row = mosaic[ln * 6 + rr]
                for p in range(ncols):
                    color = (xflat[rr * 6 + p % 6] if xmode
                             else bayer2x2[(rr & 1) * 2 + (p & 1)])
                    li, idx = _lane(color, rr, p, xmode)
                    enc.targets[li][idx] = int(row[col0 + p])
            enc.run_group()
            for rr in range(6):
                out = achievable[ln * 6 + rr]
                for p in range(ncols):
                    color = (xflat[rr * 6 + p % 6] if xmode
                             else bayer2x2[(rr & 1) * 2 + (p & 1)])
                    li, idx = _lane(color, rr, p, xmode)
                    out[col0 + p] = enc.lines[li][1 + idx]
            enc.slide()
        streams.append(enc.w.finish())

    header = struct.pack(">HBBBHHHHBH", 0x4953, 1, 16 if xmode else 0, bits,
                         h, rounded, w, bw, blocks, total_lines)
    table = b"".join(struct.pack(">I", len(s)) for s in streams)
    tlen = 4 * blocks
    if tlen & 0xC:
        tlen += 0x10 - (tlen & 0xC)
    table += b"\x00" * (tlen - 4 * blocks)
    return header + table + b"".join(streams), achievable


def write_raf_compressed(path, mosaic, bits=14, xtrans=None, model="X-SYNTH",
                         wb_grbg=(1024, 2048, 1536, 1024)):
    """Write a classic-container RAF whose CFA payload is Fuji-compressed.

    Returns the achievable mosaic (== the exact decoder output)."""
    payload, achievable = encode_fuji_compressed(mosaic, bits, xtrans=xtrans)

    h, w = np.asarray(mosaic).shape
    records = [(0x100, struct.pack(">HH", h, w))]
    if xtrans is not None:
        cells = [int(xtrans[r][c]) for r in range(6) for c in range(6)]
        records.append((0x131, bytes(cells[::-1])))
    records.append((0x2FF0, struct.pack(">HHHH", *wb_grbg)))

    cfa_hdr = struct.pack(">I", len(records))
    for rid, data in records:
        cfa_hdr += struct.pack(">HH", rid, len(data)) + data

    header_len = 0x6C
    cfa_hdr_off = header_len
    cfa_off = cfa_hdr_off + len(cfa_hdr)
    out = bytearray(b"\x00" * header_len)
    out[0:16] = b"FUJIFILMCCD-RAW "
    mb = model.encode()[:31]
    out[0x1C:0x1C + len(mb)] = mb
    struct.pack_into(">II", out, 0x5C, cfa_hdr_off, len(cfa_hdr))
    struct.pack_into(">II", out, 0x64, cfa_off, len(payload))
    out += cfa_hdr + payload
    with open(path, "wb") as f:
        f.write(bytes(out))
    return achievable
