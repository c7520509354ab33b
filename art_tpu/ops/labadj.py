"""Lab adjustments (reference: iplabadjustments.cc, "Luminance Curve").

Brightness (toe/shoulder spline), contrast (NURBS around the image's
mean luminance), L/a/b user curves, chromaticity scaling. Operates in
Lab.

The reference centers the contrast NURBS on the mean of the
brightness-curve-mapped L histogram (get_L_curve,
iplabadjustments.cc:93-116) — a data-dependent curve. Here the full
composed curve (brightness -> contrast(avg) -> user L) is fitted at
plan time for a grid of avg values (cubic-segment representation — a
homogeneous stack, linear in its coefficients); the device computes
the true mean of brightness(L) over the plane and linearly
interpolates between the two nearest rows. Max deviation from the
exact reference formula at the true mean: ~8e-4 of the L range
(interpolation error of the 25-point AVG_GRID, measured in
tests/test_ops.py). The mean runs over the padded
plane (reflect padding biases it by the pad fraction, <1% at bench
shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import DiagonalCurve
from art_tpu.core.curve1d import eval_curve, fit_curve, fit_curves
from art_tpu.core.image import MAXVAL

AVG_GRID = np.linspace(0.05, 0.95, 25)  # contrast-center sample points


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


def _compose(x, *luts):
    y = x
    for lut in luts:
        if lut is None:
            continue
        idx = np.clip(y, 0, 1) * (lut.shape[0] - 1)
        i0 = idx.astype(np.int64)
        i1 = np.minimum(i0 + 1, lut.shape[0] - 1)
        fr = idx - i0
        y = lut[i0] * (1 - fr) + lut[i1] * fr
    return y


def plan(pp, ctx):
    lc = pp.lab_curve
    if not lc.enabled:
        return None
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    x = np.linspace(0.0, 1.0, 65536)
    bl = _brightness_curve(lc.brightness)
    uc = DiagonalCurve(lc.lcurve)
    ul = None if uc.is_identity() else uc.get_val(x)

    l_mode = 0  # 0 = identity, 1 = fixed composed curve, 2 = avg family
    lcomp = None
    lfam = None
    bfit = None
    if lc.contrast:
        # the (25, K, 4) cubic-segment stack is homogeneous and linear
        # in its coefficients, so rows interpolate exactly along avg
        fam = [fit_curve(
                   _compose(x, bl, _contrast_curve(lc.contrast, avg=a),
                            ul), allow_poly=False)
               for a in AVG_GRID]
        lfam = np.stack(fam).astype(np.float32)
        if bl is not None:
            bfit = fit_curve(bl)
        l_mode = 2
    elif bl is not None or ul is not None:
        lcomp = fit_curve(_compose(x, bl, ul))
        l_mode = 1

    ac = DiagonalCurve(lc.acurve)
    bc = DiagonalCurve(lc.bcurve)
    data = {
        "ws": work.astype(np.float32),
        "iws": np.linalg.inv(work).astype(np.float32),
        "chrom": np.float32(1.0 + lc.chromaticity / 100.0),
    }
    if l_mode == 2:
        data["lfam"] = lfam
        if bfit is not None:
            data["bcoeffs"] = bfit
    elif l_mode == 1:
        data["lcoeffs"] = lcomp
    use_ab = not (ac.is_identity() and bc.is_identity())
    if use_ab:
        # ab curves: domain [-42000, 42000] mapped to [0,1]
        data["acoeffs"] = fit_curve(ac.get_val(x))
        data["bcoeffs_ab"] = fit_curve(bc.get_val(x))
    if l_mode == 0 and not use_ab and lc.chromaticity == 0:
        return None
    return (l_mode, use_ab), data


def apply(rgb, data, static):
    l_mode, has_ab = static
    if isinstance(l_mode, bool):  # legacy static form
        l_mode = 1 if l_mode else 0
    ws = data["ws"]
    iws = data["iws"]
    x = rgb / MAXVAL
    xx = ws[0, 0] * x[0] + ws[0, 1] * x[1] + ws[0, 2] * x[2]
    yy = ws[1, 0] * x[0] + ws[1, 1] * x[1] + ws[1, 2] * x[2]
    zz = ws[2, 0] * x[0] + ws[2, 1] * x[1] + ws[2, 2] * x[2]
    L, a, b = cs.xyz_to_lab(xx, yy, zz, jnp)
    if l_mode == 2:
        # contrast center = mean of brightness(L), the reference's
        # histogram-derived avg (iplabadjustments.cc:95-106)
        Ln = jnp.clip(L / 100.0, 0.0, 1.0)
        if "bcoeffs" in data:
            m = jnp.mean(eval_curve(Ln, data["bcoeffs"], in_max=1.0,
                                    out_max=1.0))
        else:
            m = jnp.mean(Ln)
        n_avg = data["lfam"].shape[0]
        a0 = float(AVG_GRID[0])
        a1 = float(AVG_GRID[-1])
        pos = jnp.clip((m - a0) / (a1 - a0), 0.0, 1.0) * (n_avg - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_avg - 2)
        fr = pos - i0.astype(pos.dtype)
        coeffs = (data["lfam"][i0] * (1.0 - fr)
                  + data["lfam"][i0 + 1] * fr)
        L = eval_curve(Ln, coeffs, in_max=1.0, out_max=100.0)
    elif l_mode == 1:
        L = eval_curve(jnp.clip(L / 100.0, 0.0, 1.0), data["lcoeffs"],
                       in_max=1.0, out_max=100.0)
    if has_ab:
        an = jnp.clip(a / 256.0 + 0.5, 0.0, 1.0)
        bn = jnp.clip(b / 256.0 + 0.5, 0.0, 1.0)
        a = (eval_curve(an, data["acoeffs"], in_max=1.0, out_max=1.0)
             - 0.5) * 256.0
        b = (eval_curve(bn, data["bcoeffs_ab"], in_max=1.0, out_max=1.0)
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
