"""Lab adjustments (reference: iplabadjustments.cc, "Luminance Curve").

Brightness (toe/shoulder spline), contrast (NURBS around the mean — the
mean is approximated at plan time with mid-gray; noted deviation),
L/a/b user curves, chromaticity scaling. Operates in Lab.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import DiagonalCurve
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL


def _brightness_curve(brightness, n=65536):
    if not brightness:
        return None
    pts = [4,  # DCT_CatmullRom? reference uses spline-ish; NURBS index 3
           0.0, 0.0,
           0.1, 0.1 + abs(brightness) / 150.0,
           0.7, min(1.0, 0.7 + abs(brightness) / 300.0),
           1.0, 1.0]
    c = DiagonalCurve(pts)
    x = np.linspace(0.0, 1.0, n)
    y = c.get_val(x)
    if brightness < 0:
        # inverse mapping (get_L_curve: swap axes for negative brightness)
        y = np.interp(x, y, x)
    return y


def _contrast_curve(contrast, avg=0.5, n=65536):
    if not contrast:
        return None
    pts = [3,  # NURBS
           0.0, 0.0,
           avg - avg * (0.6 - contrast / 250.0),
           avg - avg * (0.6 + contrast / 250.0),
           avg + (1 - avg) * (0.6 - contrast / 250.0),
           avg + (1 - avg) * (0.6 + contrast / 250.0),
           1.0, 1.0]
    c = DiagonalCurve(pts)
    x = np.linspace(0.0, 1.0, n)
    return c.get_val(x)


def plan(pp, ctx):
    lc = pp.lab_curve
    if not lc.enabled:
        return None
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    luts = []
    bl = _brightness_curve(lc.brightness)
    if bl is not None:
        luts.append(bl)
    cl = _contrast_curve(lc.contrast)
    if cl is not None:
        luts.append(cl)
    uc = DiagonalCurve(lc.lcurve)
    if not uc.is_identity():
        x = np.linspace(0.0, 1.0, 65536)
        luts.append(uc.get_val(x))
    lcomp = None
    if luts:
        x = np.linspace(0.0, 1.0, 65536)
        y = x
        for lut in luts:
            idx = np.clip(y, 0, 1) * 65535
            i0 = idx.astype(np.int64)
            i1 = np.minimum(i0 + 1, 65535)
            fr = idx - i0
            y = lut[i0] * (1 - fr) + lut[i1] * fr
        lcomp = fit_curve(y)
    ac = DiagonalCurve(lc.acurve)
    bc = DiagonalCurve(lc.bcurve)
    data = {
        "ws": work.astype(np.float32),
        "iws": np.linalg.inv(work).astype(np.float32),
        "chrom": np.float32(1.0 + lc.chromaticity / 100.0),
    }
    if lcomp is not None:
        data["lcoeffs"] = lcomp
    use_ab = not (ac.is_identity() and bc.is_identity())
    if use_ab:
        # ab curves: domain [-42000, 42000] mapped to [0,1]
        x = np.linspace(0.0, 1.0, 65536)
        data["acoeffs"] = fit_curve(ac.get_val(x))
        data["bcoeffs"] = fit_curve(bc.get_val(x))
    if lcomp is None and not use_ab and lc.chromaticity == 0:
        return None
    return (lcomp is not None, use_ab), data


def apply(rgb, data, static):
    has_l, has_ab = static
    ws = data["ws"]
    iws = data["iws"]
    x = rgb / MAXVAL
    xx = ws[0, 0] * x[0] + ws[0, 1] * x[1] + ws[0, 2] * x[2]
    yy = ws[1, 0] * x[0] + ws[1, 1] * x[1] + ws[1, 2] * x[2]
    zz = ws[2, 0] * x[0] + ws[2, 1] * x[1] + ws[2, 2] * x[2]
    L, a, b = cs.xyz_to_lab(xx, yy, zz, jnp)
    if has_l:
        L = eval_curve(jnp.clip(L / 100.0, 0.0, 1.0), data["lcoeffs"],
                       in_max=1.0, out_max=100.0)
    if has_ab:
        an = jnp.clip(a / 256.0 + 0.5, 0.0, 1.0)
        bn = jnp.clip(b / 256.0 + 0.5, 0.0, 1.0)
        a = (eval_curve(an, data["acoeffs"], in_max=1.0, out_max=1.0)
             - 0.5) * 256.0
        b = (eval_curve(bn, data["bcoeffs"], in_max=1.0, out_max=1.0)
             - 0.5) * 256.0
    a = a * data["chrom"]
    b = b * data["chrom"]
    xo, yo, zo = cs.lab_to_xyz(L, a, b, jnp)
    out = jnp.stack([
        iws[0, 0] * xo + iws[0, 1] * yo + iws[0, 2] * zo,
        iws[1, 0] * xo + iws[1, 1] * yo + iws[1, 2] * zo,
        iws[2, 0] * xo + iws[2, 1] * yo + iws[2, 2] * zo,
    ])
    return out * MAXVAL
