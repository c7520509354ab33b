"""Arbitrary ICC profile files -> (matrix, TRC) pairs.

Reference: ``rtengine/iccstore.cc:224-366`` (lcms2-backed profile
loading and matrix/TRC extraction for the ``iprgb2out.cc`` fast path).
The TPU build parses matrix-shaper profiles directly from the ICC
byte layout (v2/v4): colorant tags rXYZ/gXYZ/bXYZ (PCS D50-relative by
spec) plus the rTRC/gTRC/bTRC curves ('curv' identity/gamma/sampled or
'para' parametric types 0-4). Sampled curves are refit as Chebyshev
series (core.curve1d) so the device transform stays gather-free.

LUT-based (A2B-only) profiles are out of scope and raise ValueError —
the caller falls back to a named colorspace.
"""

from __future__ import annotations

import struct

import numpy as np


def _s15f16(b, off):
    return struct.unpack_from(">i", b, off)[0] / 65536.0


def _parse_curv(b, off, size):
    """'curv' tag -> TRC tuple (see colorspaces.encode_trc forms)."""
    n = struct.unpack_from(">I", b, off + 8)[0]
    if n == 0:
        return ("linear", None)
    if n == 1:
        g = struct.unpack_from(">H", b, off + 12)[0] / 256.0
        if abs(g - 1.0) < 1e-3:
            return ("linear", None)
        return ("gamma", float(g))
    samples = np.frombuffer(b, dtype=">u2", count=n,
                            offset=off + 12).astype(np.float64) / 65535.0
    return _fit_sampled(samples)


def _parse_para(b, off, size):
    """'para' tag -> ("para", (g, a, bb, c, d, e, f))."""
    typ = struct.unpack_from(">H", b, off + 8)[0]
    nv = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(typ)
    if nv is None:
        raise ValueError(f"unsupported para curve type {typ}")
    v = [_s15f16(b, off + 12 + 4 * i) for i in range(nv)]
    g = v[0]
    if typ == 0:
        if abs(g - 1.0) < 1e-3:
            return ("linear", None)
        return ("gamma", float(g))
    a, bb = v[1], v[2]
    c = v[3] if typ >= 2 else 0.0
    if typ == 1:
        d = -bb / a if a else 0.0
        return ("para", (g, a, bb, 0.0, d, 0.0, 0.0))
    if typ == 2:
        d = -bb / a if a else 0.0
        return ("para", (g, a, bb, 0.0, d, c, c))
    if typ == 3:
        d = v[4]
        return ("para", (g, a, bb, c, d, 0.0, 0.0))
    # typ == 4: y = (a x + b)^g + e (x >= d) else c x + f
    return ("para", (g, a, bb, c, v[4], v[5], v[6]))


def _fit_sampled(samples):
    """Sampled TRC -> ("cheb", (enc, dec)) Chebyshev pair, or ("lut",
    (enc_samples, dec_samples)) when the curve resists fitting."""
    from art_tpu.core.curve1d import fit_curve

    samples = np.clip(np.asarray(samples, dtype=np.float64), 0.0, 1.0)
    if samples[0] > samples[-1]:  # decreasing TRC: normalize orientation
        samples = samples[::-1].copy()
    xs = np.linspace(0.0, 1.0, 4096)
    # ICC TRC samples map device -> linear (the decode direction, same
    # convention as the ("gamma", g) tag); encode is its inverse
    dense = np.interp(xs, np.linspace(0, 1, len(samples)), samples)
    mono = np.maximum.accumulate(dense)
    inv = np.interp(xs, mono, xs)
    dec = fit_curve(dense)
    enc = fit_curve(inv)
    if enc is not None and dec is not None and enc.ndim == 1 \
            and dec.ndim == 1:
        return ("cheb", (tuple(float(c) for c in enc),
                         tuple(float(c) for c in dec)))
    # fallback: 256-sample linear-interp pair (encode first, like cheb)
    sub = np.interp(np.linspace(0, 1, 256), xs, dense)
    isub = np.interp(np.linspace(0, 1, 256), xs, inv)
    return ("lut", (tuple(float(v) for v in isub),
                    tuple(float(v) for v in sub)))


def parse_icc_bytes(data: bytes):
    """Parse a matrix-shaper ICC profile.

    Returns dict: rgb_to_xyz (3,3) D50-relative, trc (tagged tuple,
    green channel), trcs (per-channel), description, bytes.
    Raises ValueError for non-RGB or LUT-only profiles."""
    if len(data) < 132 or data[36:40] != b"acsp":
        raise ValueError("not an ICC profile")
    dev_space = data[16:20]
    if dev_space != b"RGB ":
        raise ValueError(f"unsupported device space {dev_space!r}")
    count = struct.unpack_from(">I", data, 128)[0]
    if count > 1024:
        raise ValueError("corrupt tag table")
    tags = {}
    for i in range(count):
        sig, off, size = struct.unpack_from(">4sII", data, 132 + 12 * i)
        tags[sig] = (off, size)

    def xyz_tag(sig):
        if sig not in tags:
            return None
        off, _ = tags[sig]
        if data[off : off + 4] != b"XYZ ":
            return None
        return [_s15f16(data, off + 8), _s15f16(data, off + 12),
                _s15f16(data, off + 16)]

    r = xyz_tag(b"rXYZ")
    g = xyz_tag(b"gXYZ")
    b = xyz_tag(b"bXYZ")
    if r is None or g is None or b is None:
        raise ValueError("profile has no matrix colorants (LUT profile?)")
    m = np.array([r, g, b]).T  # columns = colorants

    def trc_tag(sig):
        if sig not in tags:
            return ("linear", None)
        off, size = tags[sig]
        typ = data[off : off + 4]
        if typ == b"curv":
            return _parse_curv(data, off, size)
        if typ == b"para":
            return _parse_para(data, off, size)
        raise ValueError(f"unsupported TRC tag type {typ!r}")

    trcs = tuple(trc_tag(s) for s in (b"rTRC", b"gTRC", b"bTRC"))

    desc = ""
    for sig in (b"desc",):
        if sig in tags:
            off, size = tags[sig]
            typ = data[off : off + 4]
            try:
                if typ == b"desc":  # v2 textDescription
                    n = struct.unpack_from(">I", data, off + 8)[0]
                    desc = data[off + 12 : off + 12 + n - 1].decode(
                        "ascii", "replace")
                elif typ == b"mluc":  # v4 multiLocalizedUnicode
                    nrec = struct.unpack_from(">I", data, off + 8)[0]
                    if nrec:
                        ln, loff = struct.unpack_from(">II", data,
                                                      off + 20)
                        desc = data[off + loff : off + loff + ln].decode(
                            "utf-16-be", "replace")
            except Exception:
                desc = ""
    return {
        "rgb_to_xyz": m,
        "trc": trcs[1],
        "trcs": trcs,
        "description": desc,
        "bytes": data,
    }


def load_icc(path):
    with open(path, "rb") as f:
        return parse_icc_bytes(f.read())
