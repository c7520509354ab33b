"""Synthetic Phase One IIQ writer — test oracle for the native decoder.

Builds the "Raw" directory container and the compressed per-row ph1 bit
streams (behavioral spec: dcraw.cc parse_phase_one :7593 +
phase_one_load_raw_c): every 8 columns each parity chain re-selects a
difference bit-length class via unary+1-bit code from the fixed table
{8,7,6,9,11,10,5,12,14,13}; class 14 escapes to raw 16-bit samples.
Stored sample = mosaic >> 2 for formats != 8 (the decoder shifts left)."""

from __future__ import annotations

import struct

import numpy as np

from tests.util_srw import _WordBitWriter

_LEN_TABLE = [8, 7, 6, 9, 11, 10, 5, 12, 14, 13]


def _emit_len_select(bw, i):
    idx = _LEN_TABLE.index(i)
    zeros = idx // 2 + 1
    for _ in range(zeros):
        bw.put(0, 1)
    if zeros < 5:
        bw.put(1, 1)
    bw.put(idx & 1, 1)


def _encode_row(pix_row):
    """pix_row: stored (pre-shift) u16 samples."""
    w = len(pix_row)
    bw = _WordBitWriter()
    pred = [0, 0]
    tail = w & ~7
    col = 0
    while col < tail:
        block = pix_row[col:col + 8]
        lens = [None, None]
        for par in (0, 1):
            diffs = []
            pr = pred[par]
            for k in range(par, 8, 2):
                diffs.append(int(block[k]) - pr)
                pr = int(block[k])
            need = 14
            for cand in sorted(c for c in _LEN_TABLE if c != 14):
                lo, hi = 1 - (1 << (cand - 1)), 1 << (cand - 1)
                if all(lo <= d <= hi for d in diffs):
                    need = cand
                    break
            lens[par] = need
        for par in (0, 1):
            _emit_len_select(bw, lens[par])
        for k in range(8):
            par = k & 1
            i = lens[par]
            v = int(block[k])
            if i == 14:
                bw.put(v, 16)
                pred[par] = v
            else:
                d = v - pred[par]
                bw.put(d - 1 + (1 << (i - 1)), i)
                pred[par] = v
        col += 8
    while col < w:  # tail columns: raw 16-bit, len forced to 14
        v = int(pix_row[col])
        bw.put(v, 16)
        pred[col & 1] = v
        col += 1
    return bw.flush()


def write_iiq(path, mosaic, fmt=6, black=0, wb_rgb=(2.0, 1.0, 1.5),
              model="SYNTH IQ180", black_col=None, black_row=None,
              split_col=0, split_row=0, payload_rows=None):
    """mosaic: the final decoded values the test expects (u16). The
    writer stores mosaic >> 2 and lets the decoder shift back, so
    mosaic % 4 must be 0 when black/corrections are 0.
    black_col: (h, 2) int16 column-split corrections; black_row: (w, 2).
    payload_rows: raw per-row byte override for hand vectors."""
    mosaic = np.asarray(mosaic, dtype=np.int64)
    h, w = mosaic.shape

    if payload_rows is None:
        cb = np.zeros((h, 2), np.int64) if black_col is None \
            else np.asarray(black_col, np.int64)
        rb = np.zeros((w, 2), np.int64) if black_row is None \
            else np.asarray(black_row, np.int64)
        stored = np.zeros((h, w), np.uint16)
        for row in range(h):
            for col in range(w):
                corr = (- black
                        + cb[row][1 if col >= split_col else 0]
                        + rb[col][1 if row >= split_row else 0])
                v = int(mosaic[row, col]) - corr
                assert v % 4 == 0 and 0 <= (v >> 2) < 65536, \
                    "mosaic values must be reachable (multiple-of-4 " \
                    "after corrections)"
                stored[row, col] = v >> 2
        payload_rows = [_encode_row(stored[row]) for row in range(h)]

    streams = b"".join(payload_rows)
    rowoff = []
    acc = 0
    for pr in payload_rows:
        rowoff.append(acc)
        acc += len(pr)

    mdl = model.encode() + b"\x00"
    entries = [
        (0x108, 4, 1, w), (0x109, 4, 1, h), (0x10e, 4, 1, fmt),
        (0x21d, 4, 1, black), (0x222, 4, 1, split_col),
        (0x224, 4, 1, split_row),
    ]
    blobs = []  # (tag, type, len, bytes)
    blobs.append((0x107, 11, 3,
                  b"".join(struct.pack("<f", g) for g in wb_rgb)))
    blobs.append((0x21c, 4, h, b"".join(struct.pack("<I", o)
                                        for o in rowoff)))
    blobs.append((0x10f, 4, 1, streams))
    blobs.append((0x301, 2, len(mdl), mdl))
    if black_col is not None:
        blobs.append((0x223, 4, h,
                      np.asarray(black_col, "<i2").tobytes()))
    if black_row is not None:
        blobs.append((0x225, 4, w,
                      np.asarray(black_row, "<i2").tobytes()))

    n = len(entries) + len(blobs)
    hdr_sz = 12
    dir_off = hdr_sz
    dir_sz = 8 + 16 * n
    data_pos = dir_off + dir_sz
    dir_bytes = struct.pack("<II", n, 0)
    data_bytes = b""
    for tag, typ, ln, val in entries:
        dir_bytes += struct.pack("<IIII", tag, typ, ln, val)
    for tag, typ, ln, blob in blobs:
        dir_bytes += struct.pack("<IIII", tag, typ, ln, data_pos)
        data_bytes += blob
        data_pos += len(blob)

    out = (b"IIII" + bytes((0x30,)) + b"waR"
           + struct.pack("<I", dir_off) + dir_bytes + data_bytes)
    with open(path, "wb") as f:
        f.write(out)
