"""Color space constants and conversions.

Reference: ``rtengine/iccmatrices.h`` (Bradford D50-adapted primaries),
``rtengine/color.{h,cc}`` (transfer curves, Lab/XYZ). The matrices are the
standard published colorimetry constants the reference also uses; naming
convention follows the reference: ``xyz_<space>`` maps RGB -> XYZ.

Everything here is dual-use: plain functions operate on numpy arrays at plan
time and on jnp arrays inside jit (all ops are elementwise / matmul).
"""

from __future__ import annotations

import numpy as np

# -- Bradford-adapted (D50) RGB<->XYZ matrices (iccmatrices.h:76-160) -------

MATRICES_RGB_TO_XYZ = {
    "sRGB": np.array(
        [
            [0.4360747, 0.3850649, 0.1430804],
            [0.2225045, 0.7168786, 0.0606169],
            [0.0139322, 0.0971045, 0.7141733],
        ]
    ),
    "Adobe RGB": np.array(
        [
            [0.6097559, 0.2052401, 0.1492240],
            [0.3111242, 0.6256560, 0.0632197],
            [0.0194811, 0.0608902, 0.7448387],
        ]
    ),
    "ProPhoto": np.array(
        [
            [0.7976749, 0.1351917, 0.0313534],
            [0.2880402, 0.7118741, 0.0000857],
            [0.0000000, 0.0000000, 0.8252100],
        ]
    ),
    "Rec2020": np.array(
        [
            [0.6734241, 0.1656411, 0.1251286],
            [0.2790177, 0.6753402, 0.0456377],
            [-0.0019300, 0.0299784, 0.7973330],
        ]
    ),
    "ACESp0": np.array(
        [
            [0.9908526, 0.0122334, -0.0388654],
            [0.3618807, 0.72255045, -0.0843859],
            [-0.0027093, 0.0082323, 0.8196880],
        ]
    ),
    "ACESp1": np.array(
        [
            [0.689697, 0.149944, 0.124559],
            [0.284448, 0.671758, 0.043794],
            [-0.006043, 0.009998, 0.820945],
        ]
    ),
}

MATRICES_XYZ_TO_RGB = {k: np.linalg.inv(v) for k, v in MATRICES_RGB_TO_XYZ.items()}

WORKING_SPACES = tuple(MATRICES_RGB_TO_XYZ.keys())

# Bradford chromatic adaptation between illuminants (iccmatrices.h:25-47)
D65_TO_D50 = np.array(
    [
        [0.9555766, -0.0230393, 0.0631636],
        [-0.0282895, 1.0099416, 0.0210077],
        [0.0122982, -0.0204830, 1.3299098],
    ]
)
D50_TO_D65 = np.array(
    [
        [1.0478112, 0.0228866, -0.0501270],
        [0.0295424, 0.9904844, -0.0170491],
        [-0.0092345, 0.0150436, 0.7521316],
    ]
)

# sRGB D65 native matrices (iccmatrices.h:51-62) — used for display paths
XYZ_FROM_SRGB_D65 = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)
SRGB_D65_FROM_XYZ = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ]
)

# D50 reference white (color.h uses these for Lab)
D50_WHITE = np.array([0.9642, 1.0, 0.8249])


def rgb_to_xyz_matrix(space: str) -> np.ndarray:
    return MATRICES_RGB_TO_XYZ[space].copy()


def xyz_to_rgb_matrix(space: str) -> np.ndarray:
    return MATRICES_XYZ_TO_RGB[space].copy()


def working_space_matrix(src: str, dst: str) -> np.ndarray:
    """3x3 matrix converting linear RGB in `src` to linear RGB in `dst`."""
    return MATRICES_XYZ_TO_RGB[dst] @ MATRICES_RGB_TO_XYZ[src]


# -- transfer curves --------------------------------------------------------
# The reference's Color::gamma* family (color.h). These operate on
# normalized [0,1] values and work with numpy or jnp inputs (pass the array
# module explicitly to stay jit-traceable).

def _power_branch_fit(g, x0, deg=8):
    """Polynomial (highest-first) for 1.055*x^(1/g)-0.055-style branches
    evaluated in u = affine(x^(1/8)): the x^(1/8) warp makes the power
    analytic on [x0, 1] so degree 8 reaches ~1e-8 (vs ~50 VPU ops for
    the pow lowering)."""
    t0 = x0 ** 0.125
    tt = np.linspace(t0, 1.0, 50001)
    y = tt ** (8.0 / g)
    u = 2.0 * (tt - t0) / (1.0 - t0) - 1.0
    c = np.polynomial.chebyshev.chebfit(u, y, deg)
    pol = np.polynomial.chebyshev.cheb2poly(c)[::-1]
    return (tuple(float(v) for v in pol), float(t0))


import functools as _functools


@_functools.lru_cache(None)
def _srgb_gamma_fit():
    return _power_branch_fit(2.4, 0.0031308)


def srgb_gamma(x, xp=np):
    """Linear -> sRGB encoding (g=2.4, slope 12.92)."""
    x = xp.clip(x, 0.0, 1.0)
    if xp is np:
        return xp.where(
            x <= 0.0031308,
            x * 12.92,
            1.055 * xp.power(xp.maximum(x, 1e-12), 1.0 / 2.4) - 0.055,
        )
    # device path: Horner in the x^(1/8) warp (error ~1e-8, far below
    # the 16-bit output LSB; pow lowers to a slow log/exp chain on VPU)
    pol, t0 = _srgb_gamma_fit()
    t = xp.sqrt(xp.sqrt(xp.sqrt(x)))
    u = 2.0 * (t - t0) / (1.0 - t0) - 1.0
    acc = xp.full_like(x, pol[0])
    for c in pol[1:]:
        acc = acc * u + c
    return xp.where(x <= 0.0031308, x * 12.92, 1.055 * acc - 0.055)


def srgb_igamma(y, xp=np):
    """sRGB -> linear decoding."""
    y = xp.clip(y, 0.0, 1.0)
    return xp.where(
        y <= 0.04045, y / 12.92, xp.power((y + 0.055) / 1.055, 2.4)
    )


def pure_gamma(x, g, xp=np):
    return xp.power(xp.maximum(x, 0.0), g)


def rec709_gamma(x, xp=np):
    x = xp.clip(x, 0.0, 1.0)
    return xp.where(
        x < 0.018, x * 4.5, 1.099 * xp.power(xp.maximum(x, 1e-12), 0.45) - 0.099
    )


# standard output TRCs by working-space name (for matrix+TRC output path)
OUTPUT_GAMMAS = {
    "sRGB": ("srgb", None),
    "Adobe RGB": ("gamma", 2.19921875),
    "ProPhoto": ("gamma", 1.8),
    "Rec2020": ("srgb", None),  # ART's bundled Rec2020 uses sRGB-like TRC
    "ACESp0": ("linear", None),
    "ACESp1": ("linear", None),
}


def _cheb_sqrtwarp(x, coeffs, xp):
    """Clenshaw eval of a curve1d.fit_curve 1-D Chebyshev series on the
    sqrt-warped [0,1] domain."""
    t = 2.0 * xp.sqrt(xp.clip(x, 0.0, 1.0)) - 1.0
    t2 = 2.0 * t
    b1 = xp.zeros_like(t)
    b2 = xp.zeros_like(t)
    for k in range(len(coeffs) - 1, 0, -1):
        b1, b2 = coeffs[k] + t2 * b1 - b2, b1
    return coeffs[0] + t * b1 - b2


def _para_fwd(x, p, xp):
    """ICC parametric curve type-4 general form (iccfile.py), i.e. the
    tag's device->linear (decode) direction:
    y = (a*x + b)^g + e for x >= d, else c*x + f."""
    g, a, b, c, d, e, f = p
    x = xp.clip(x, 0.0, 1.0)
    hi = xp.power(xp.maximum(a * x + b, 0.0), g) + e
    lo = c * x + f
    return xp.where(x >= d, hi, lo)


def _para_inv(y, p, xp):
    g, a, b, c, d, e, f = p
    y = xp.clip(y, 0.0, 1.0)
    yd = c * d + f
    hi = (xp.power(xp.maximum(y - e, 0.0), 1.0 / g) - b) / (a or 1.0)
    lo = (y - f) / c if c else xp.zeros_like(y)
    return xp.where(y >= yd, hi, lo)


def encode_trc(x, trc, xp=np):
    kind, g = trc
    if kind == "srgb":
        return srgb_gamma(x, xp)
    if kind == "gamma":
        return pure_gamma(xp.clip(x, 0.0, 1.0), 1.0 / g, xp)
    if kind == "para":  # ICC parametric: encode = tag inverse
        return _para_inv(x, g, xp)
    if kind == "cheb":  # fitted sampled TRC: (enc, dec) series
        return xp.clip(_cheb_sqrtwarp(x, g[0], xp), 0.0, 1.0)
    if kind == "lut":
        s = xp.asarray(g[0]) if xp is not np else np.asarray(g[0])
        idx = xp.clip(x, 0.0, 1.0) * (len(g[0]) - 1)
        i0 = xp.clip(idx.astype("int32"), 0, len(g[0]) - 2)
        fr = idx - i0
        return s[i0] * (1 - fr) + s[i0 + 1] * fr
    return xp.clip(x, 0.0, 1.0)


def decode_trc(y, trc, xp=np):
    kind, g = trc
    if kind == "srgb":
        return srgb_igamma(y, xp)
    if kind == "gamma":
        return pure_gamma(xp.clip(y, 0.0, 1.0), g, xp)
    if kind == "para":  # decode = the tag's own formula
        return _para_fwd(y, g, xp)
    if kind == "cheb":
        return xp.clip(_cheb_sqrtwarp(y, g[1], xp), 0.0, 1.0)
    if kind == "lut":
        s = xp.asarray(g[1]) if xp is not np else np.asarray(g[1])
        idx = xp.clip(y, 0.0, 1.0) * (len(g[1]) - 1)
        i0 = xp.clip(idx.astype("int32"), 0, len(g[1]) - 2)
        fr = idx - i0
        return s[i0] * (1 - fr) + s[i0 + 1] * fr
    return xp.clip(y, 0.0, 1.0)


# -- Lab (D50, matching Color::XYZ2Lab) -------------------------------------

_EPS = 216.0 / 24389.0
_KAPPA = 24389.0 / 27.0


def xyz_to_lab(x, y, z, xp=np):
    def f(t):
        return xp.where(t > _EPS, xp.cbrt(t), (_KAPPA * t + 16.0) / 116.0)

    fx = f(x / D50_WHITE[0])
    fy = f(y / D50_WHITE[1])
    fz = f(z / D50_WHITE[2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return L, a, b


def lab_to_xyz(L, a, b, xp=np):
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t * t * t
        return xp.where(t3 > _EPS, t3, (116.0 * t - 16.0) / _KAPPA)

    x = finv(fx) * D50_WHITE[0]
    y = finv(fy) * D50_WHITE[1]
    z = finv(fz) * D50_WHITE[2]
    return x, y, z


def delta_e2000(lab1, lab2):
    """CIEDE2000 between two (L,a,b) numpy arrays — test/bench oracle."""
    L1, a1, b1 = [np.asarray(v, dtype=np.float64) for v in lab1]
    L2, a2, b2 = [np.asarray(v, dtype=np.float64) for v in lab2]
    C1 = np.hypot(a1, b1)
    C2 = np.hypot(a2, b2)
    Cbar = 0.5 * (C1 + C2)
    G = 0.5 * (1 - np.sqrt(Cbar**7 / (Cbar**7 + 25.0**7)))
    a1p = (1 + G) * a1
    a2p = (1 + G) * a2
    C1p = np.hypot(a1p, b1)
    C2p = np.hypot(a2p, b2)
    h1p = np.degrees(np.arctan2(b1, a1p)) % 360
    h2p = np.degrees(np.arctan2(b2, a2p)) % 360
    dLp = L2 - L1
    dCp = C2p - C1p
    dhp = h2p - h1p
    dhp = np.where(dhp > 180, dhp - 360, dhp)
    dhp = np.where(dhp < -180, dhp + 360, dhp)
    dhp = np.where(C1p * C2p == 0, 0.0, dhp)
    dHp = 2 * np.sqrt(C1p * C2p) * np.sin(np.radians(dhp) / 2)
    Lbar = 0.5 * (L1 + L2)
    Cbarp = 0.5 * (C1p + C2p)
    hsum = h1p + h2p
    hdiff = np.abs(h1p - h2p)
    hbar = np.where(
        C1p * C2p == 0,
        hsum,
        np.where(
            hdiff <= 180,
            0.5 * hsum,
            np.where(hsum < 360, 0.5 * (hsum + 360), 0.5 * (hsum - 360)),
        ),
    )
    T = (
        1
        - 0.17 * np.cos(np.radians(hbar - 30))
        + 0.24 * np.cos(np.radians(2 * hbar))
        + 0.32 * np.cos(np.radians(3 * hbar + 6))
        - 0.20 * np.cos(np.radians(4 * hbar - 63))
    )
    dtheta = 30 * np.exp(-(((hbar - 275) / 25) ** 2))
    Rc = 2 * np.sqrt(Cbarp**7 / (Cbarp**7 + 25.0**7))
    Sl = 1 + 0.015 * (Lbar - 50) ** 2 / np.sqrt(20 + (Lbar - 50) ** 2)
    Sc = 1 + 0.045 * Cbarp
    Sh = 1 + 0.015 * Cbarp * T
    Rt = -np.sin(np.radians(2 * dtheta)) * Rc
    return np.sqrt(
        (dLp / Sl) ** 2
        + (dCp / Sc) ** 2
        + (dHp / Sh) ** 2
        + Rt * (dCp / Sc) * (dHp / Sh)
    )
