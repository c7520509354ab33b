"""Synthetic Apple QuickTake 100 writer + independent NumPy reference
decoder (dcraw.cc quicktake_100_load_raw :2756 bitstream model).

The stream is fixed-width (4-bit green codes, 2-bit chroma codes), so
ANY byte string is a valid stream: tests feed random bytes and compare
the native decoder against this independent Python implementation of
the published recurrence.
"""

from __future__ import annotations

import numpy as np

GSTEP = np.array([-89, -60, -44, -32, -22, -15, -8, -2,
                  2, 8, 15, 22, 32, 44, 60, 89])
RSTEP = np.array([[-3, -1, 1, 3], [-5, -1, 1, 5], [-8, -2, 2, 8],
                  [-13, -3, 3, 13], [-19, -4, 4, 19], [-28, -6, 6, 28]])
CURVE = np.array([
    0,1,2,3,4,5,6,7,8,9,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,
    27,28,29,30,32,33,34,35,36,37,38,39,40,41,42,43,44,45,46,47,48,49,50,
    51,53,54,55,56,57,58,59,60,61,62,63,64,65,66,67,68,69,70,71,72,74,75,
    76,77,78,79,80,81,82,83,84,86,88,90,92,94,97,99,101,103,105,107,110,
    112,114,116,118,120,123,125,127,129,131,134,136,138,140,142,144,147,
    149,151,153,155,158,160,162,164,166,168,171,173,175,177,179,181,184,
    186,188,190,192,195,197,199,201,203,205,208,210,212,214,216,218,221,
    223,226,230,235,239,244,248,252,257,261,265,270,274,278,283,287,291,
    296,300,305,309,313,318,322,326,331,335,339,344,348,352,357,361,365,
    370,374,379,383,387,392,396,400,405,409,413,418,422,426,431,435,440,
    444,448,453,457,461,466,470,474,479,483,487,492,496,500,508,519,531,
    542,553,564,575,587,598,609,620,631,643,654,665,676,687,698,710,721,
    732,743,754,766,777,788,799,810,822,833,844,855,866,878,889,900,911,
    922,933,945,956,967,978,989,1001,1012,1023])


class _BitsMSB:
    def __init__(self, data):
        self.data = data
        self.pos = 0

    def get(self, n):
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3] if (self.pos >> 3) < len(
                self.data) else 0
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def qtk100_reference_decode(stream, height, width):
    """Independent implementation of the three-stage recurrence."""
    br = _BitsMSB(stream)
    px = np.full((484, 644), 0x80, np.int64)

    def lim(v):
        return min(max(v, 0), 255)

    for row in range(2, height + 2):
        col = 2 + (row & 1)
        val = 0
        while col < width + 2:
            val = lim(((px[row - 1, col - 1] + 2 * px[row - 1, col + 1]
                        + px[row, col - 2]) >> 2) + GSTEP[br.get(4)])
            px[row, col] = val
            if col < 4:
                px[row, col - 2] = val
                px[row + 1, (~row) & 1] = val
            if row == 2:
                # dcraw writes pixel[1][col+3]; at the last column that
                # index wraps into pixel[2][0] of the contiguous buffer
                for cc in (col + 1, col + 3):
                    r_, c_ = (1, cc) if cc < 644 else (2, cc - 644)
                    px[r_, c_] = val
            col += 2
        if col < 644:
            px[row, col] = val
    for rb in range(2):
        for row in range(2 + rb, height + 2, 2):
            for col in range(3 - (row & 1), width + 2, 2):
                if row < 4 or col < 4:
                    sharp = 2
                else:
                    v = (abs(px[row - 2, col] - px[row, col - 2])
                         + abs(px[row - 2, col] - px[row - 2, col - 2])
                         + abs(px[row, col - 2] - px[row - 2, col - 2]))
                    sharp = (0 if v < 4 else 1 if v < 8 else 2
                             if v < 16 else 3 if v < 32 else 4
                             if v < 48 else 5)
                val = lim(((px[row - 2, col] + px[row, col - 2]) >> 1)
                          + RSTEP[sharp][br.get(2)])
                px[row, col] = val
                if row < 4:
                    px[row - 2, col + 2] = val
                if col < 4:
                    px[row + 2, col - 2] = val
    for row in range(2, height + 2):
        for col in range(3 - (row & 1), width + 2, 2):
            val = ((px[row, col - 1] + (px[row, col] << 2)
                    + px[row, col + 1]) >> 1) - 0x100
            px[row, col] = lim(val)
    return CURVE[px[2:height + 2, 2:width + 2]]


def write_qtk100(path, height, width, seed=0, indicator=0):
    """Write a synthetic qktk file with a random (valid) stream; returns
    the expected decode from the independent reference implementation."""
    import struct

    rng = np.random.default_rng(seed)
    nbits = height * width * 3  # 4 bits per green + 2 per chroma site
    stream = bytes(rng.integers(0, 256, size=(nbits + 7) // 8 + 8,
                                dtype=np.uint8))
    off = 738 if indicator == 30 else 736
    hdr = bytearray(off)
    hdr[0:4] = b"qktk"
    hdr[544:546] = struct.pack(">H", height)
    hdr[546:548] = struct.pack(">H", width)
    hdr[552:554] = struct.pack(">H", indicator)
    with open(path, "wb") as f:
        f.write(bytes(hdr) + stream)
    return qtk100_reference_decode(stream, height, width)
