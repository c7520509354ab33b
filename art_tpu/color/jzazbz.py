"""Jzazbz appearance space (reference: color.cc:6706-6742, color.h:1761-1800).

Standard Jzazbz (Safdar et al. 2017) with the reference's conventions:
input XYZ is D50-relative and adapted to D65 by the Bradford matrices; the
PQ transfer treats 1.0 as 100 nits (x*1e-4 scale inside PQ).

Functions are jnp-traceable (elementwise only).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs

_M2 = (2523.0 / 4096.0) * 128.0  # 78.84375
_D50_TO_D65 = cs.D50_TO_D65.astype("float32")
_D65_TO_D50 = cs.D65_TO_D50.astype("float32")


def _pq_exact(x):
    x = jnp.maximum(x, 1e-10)
    xx = jnp.power(x * 1e-4, 0.1593017578125)
    return jnp.power((0.8359375 + 18.8515625 * xx) / (1 + 18.6875 * xx),
                     134.034375)


def _pq_inv_exact(x):
    x = jnp.maximum(x, 1e-10)
    xx = jnp.power(x, 7.460772656268214e-03)  # 1/134.034375
    num = jnp.maximum(xx - 0.8359375, 0.0)
    den = 18.8515625 - 18.6875 * xx
    return 1e4 * jnp.power(num / jnp.maximum(den, 1e-10), 6.277394636015326)


# ---------------------------------------------------------------------------
# Fast PQ: Chebyshev series on power-warped domains.
#
# jnp.power lowers to log+exp on the TPU VPU; the neutral tone curve alone
# evaluates 9 plane-level PQ transfers, making pow the single largest VPU
# cost of the default pipeline. Both transfers are fixed scalar curves, so
# they are refit once on the host as Chebyshev series whose device cost is
# a sqrt chain + an FMA recurrence (same trick as core.curve1d, but with
# warps chosen to tame PQ's fractional-power endpoint singularity):
#   forward:  t = (x/XMAX)^(1/32)  (5 sqrts) — the inner (x*1e-4)^0.1593
#             becomes t^5.1, giving near-geometric convergence (deg 24
#             reaches 4.3e-8 absolute on a 0.084 range — the f32 floor);
#   inverse:  v = (y/YMAX)^(1/8)   (3 sqrts) — deg 20 reaches 1.9e-7
#             absolute on the 0..4 output range (<< 1/65535 of scale).
# Out-of-range inputs clamp to the fit domain (x>XMAX only occurs for
# >4x-overrange highlights, where the appearance model feeds ratios).
_PQ_XMAX = 4.0


@functools.lru_cache(None)
def _pq_fits():
    def pq64(x):
        x = np.maximum(x, 1e-12)
        xx = (x * 1e-4) ** 0.1593017578125
        return ((0.8359375 + 18.8515625 * xx)
                / (1 + 18.6875 * xx)) ** 134.034375

    def pq_inv64(y):
        y = np.maximum(y, 1e-12)
        xx = y ** (1.0 / 134.034375)
        num = np.maximum(xx - 0.8359375, 0.0)
        den = 18.8515625 - 18.6875 * xx
        return 1e4 * (num / np.maximum(den, 1e-10)) ** 6.277394636015326

    ymax = float(pq64(np.float64(_PQ_XMAX)))

    def split_fit(f, deg_half):
        # even/odd Horner split on t in [-1,1]: f(t) ~ P(t^2) + t*Q(t^2).
        # Two half-degree Horner chains cost half the FMAs of Clenshaw and
        # evaluate MORE accurately in f32 (shorter cancellation chains):
        # fwd 11+11 -> 3.5e-7 abs, inv 9+9 -> 1.6e-6 abs (f64 oracle).
        t = np.linspace(-1.0, 1.0, 40001)
        y = f(t)
        fe = 0.5 * (y + y[::-1])
        fo = 0.5 * (y - y[::-1])
        half = t > 0
        a = np.vander(t[half] ** 2, deg_half + 1)
        p, *_ = np.linalg.lstsq(a, fe[half], rcond=None)
        q, *_ = np.linalg.lstsq(a, fo[half] / t[half], rcond=None)
        return tuple(float(c) for c in p), tuple(float(c) for c in q)

    pf, qf = split_fit(lambda t: pq64(_PQ_XMAX * ((t + 1) / 2) ** 32), 11)
    pi, qi = split_fit(lambda t: pq_inv64(ymax * ((t + 1) / 2) ** 8), 9)
    return pf, qf, pi, qi, ymax


def _horner_split(t, p, q):
    s = t * t
    accp = jnp.full_like(t, p[0])
    for c in p[1:]:
        accp = accp * s + c
    accq = jnp.full_like(t, q[0])
    for c in q[1:]:
        accq = accq * s + c
    return accp + t * accq


def _pq(x):
    pf, qf, _, _, _ = _pq_fits()
    t = jnp.clip(x * (1.0 / _PQ_XMAX), 0.0, 1.0)
    for _ in range(5):  # t^(1/32)
        t = jnp.sqrt(t)
    return _horner_split(2.0 * t - 1.0, pf, qf)


def _pq_inv(y):
    _, _, pi, qi, ymax = _pq_fits()
    v = jnp.clip(y * (1.0 / ymax), 0.0, 1.0)
    v = jnp.sqrt(jnp.sqrt(jnp.sqrt(v)))  # v^(1/8)
    return jnp.maximum(_horner_split(2.0 * v - 1.0, pi, qi), 0.0)


def xyz_to_jzazbz(x, y, z):
    # D50 -> D65 (reference XYZ_D50_to_D65)
    m = _D50_TO_D65
    x, y, z = (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
               m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
               m[2, 0] * x + m[2, 1] * y + m[2, 2] * z)
    lp = _pq(0.674207838 * x + 0.382799340 * y - 0.047570458 * z)
    mp = _pq(0.149284160 * x + 0.739628340 * y + 0.083327300 * z)
    sp = _pq(0.070941080 * x + 0.174768000 * y + 0.670970020 * z)
    iz = 0.5 * (lp + mp)
    az = 3.524000 * lp - 4.066708 * mp + 0.542708 * sp
    bz = 0.199076 * lp + 1.096799 * mp - 1.295875 * sp
    jz = (0.44 * iz) / (1.0 - 0.56 * iz) - 1.6295499532821566e-11
    return jz, az, bz


def jzazbz_to_xyz(jz, az, bz):
    jz = jz + 1.6295499532821566e-11
    iz = jz / (0.44 + 0.56 * jz)
    l = _pq_inv(iz + 1.386050432715393e-1 * az + 5.804731615611869e-2 * bz)
    m = _pq_inv(iz - 1.386050432715393e-1 * az - 5.804731615611891e-2 * bz)
    s = _pq_inv(iz - 9.601924202631895e-2 * az - 8.118918960560390e-1 * bz)
    x = 1.661373055774069e+00 * l - 9.145230923250668e-01 * m + 2.313620767186147e-01 * s
    y = -3.250758740427037e-01 * l + 1.571847038366936e+00 * m - 2.182538318672940e-01 * s
    z = -9.098281098284756e-02 * l - 3.127282905230740e-01 * m + 1.522766561305260e+00 * s
    mm = _D65_TO_D50
    return (mm[0, 0] * x + mm[0, 1] * y + mm[0, 2] * z,
            mm[1, 0] * x + mm[1, 1] * y + mm[1, 2] * z,
            mm[2, 0] * x + mm[2, 1] * y + mm[2, 2] * z)


def rgb_to_jzazbz_rgbin(r, g, b, ws):
    """ws: (3,3) working RGB -> XYZ(D50). Returns cartesian (Jz, az, bz)."""
    x = ws[0, 0] * r + ws[0, 1] * g + ws[0, 2] * b
    y = ws[1, 0] * r + ws[1, 1] * g + ws[1, 2] * b
    z = ws[2, 0] * r + ws[2, 1] * g + ws[2, 2] * b
    return xyz_to_jzazbz(x, y, z)


def rgb_to_jzczhz(r, g, b, ws):
    """ws: (3,3) working RGB -> XYZ(D50). Returns (Jz, Cz, hz).

    Hue convention follows the reference (jzazbz2jzch -> yuv2hsl(bz, az)):
    hz = atan2(az, bz).
    """
    x = ws[0, 0] * r + ws[0, 1] * g + ws[0, 2] * b
    y = ws[1, 0] * r + ws[1, 1] * g + ws[1, 2] * b
    z = ws[2, 0] * r + ws[2, 1] * g + ws[2, 2] * b
    jz, az, bz = xyz_to_jzazbz(x, y, z)
    cz = jnp.hypot(az, bz)
    hz = jnp.arctan2(az, bz)
    return jz, cz, hz


def jzczhz_to_rgb(jz, cz, hz, iws):
    az = cz * jnp.sin(hz)
    bz = cz * jnp.cos(hz)
    x, y, z = jzazbz_to_xyz(jz, az, bz)
    r = iws[0, 0] * x + iws[0, 1] * y + iws[0, 2] * z
    g = iws[1, 0] * x + iws[1, 1] * y + iws[1, 2] * z
    b = iws[2, 0] * x + iws[2, 1] * y + iws[2, 2] * z
    return r, g, b
