"""Defringe (reference: PF_correct_RT.cc PF_correct_RT).

Hue-selective chroma-deviation weighting: fringe = 1/(chroma_dev + avg);
pixels below the threshold factor get their a/b replaced by the
fringe-weighted window average (window = 2*ceil(2r)+1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import FlatCurve
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import box_blur, gauss_blur


def plan(pp, ctx):
    d = pp.defringe
    if not d.enabled:
        return None
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    hc = FlatCurve(d.huecurve, periodic=True, identity_value=0.5)
    data = {
        "ws": work.astype(np.float32),
        "iws": np.linalg.inv(work).astype(np.float32),
        "thresh": np.float32(d.threshold),
    }
    use_curve = not hc.is_identity()
    if use_curve:
        data["hcoeffs"] = fit_curve(hc.lut(8192))
    halfwin = int(np.ceil(2 * d.radius)) + 1
    return (float(max(d.radius, 0.3)), halfwin, use_curve), data


def apply(rgb, data, static):
    radius, halfwin, use_curve = static
    ws = data["ws"]
    iws = data["iws"]
    x = rgb / MAXVAL
    xx = ws[0, 0] * x[0] + ws[0, 1] * x[1] + ws[0, 2] * x[2]
    yy = ws[1, 0] * x[0] + ws[1, 1] * x[1] + ws[1, 2] * x[2]
    zz = ws[2, 0] * x[0] + ws[2, 1] * x[1] + ws[2, 2] * x[2]
    L, a, b = cs.xyz_to_lab(xx, yy, zz, jnp)
    a = a * 327.68
    b = b * 327.68
    L = L * 327.68

    ta = gauss_blur(a, radius)
    tb = gauss_blur(b, radius)

    factor = jnp.ones_like(a)
    if use_curve:
        hh = jnp.arctan2(b, a) / (2 * jnp.pi)
        h01 = jnp.mod(hh + 1.0 + 1.0 / 6.0, 1.0)
        chparam = eval_curve(h01, data["hcoeffs"], in_max=1.0,
                             out_max=1.0) - 0.5
        chparam = jnp.where(chparam < 0, chparam * 2.0, chparam)
        factor = (1.0 + chparam) ** 2

    chroma = factor * ((a - ta) ** 2 + (b - tb) ** 2)
    chromave = jnp.mean(chroma)
    fringe = 1.0 / (chroma + chromave)
    threshfactor = 1.0 / ((data["thresh"] / 33.0) ** 2 * chromave * 5.0
                          + chromave)

    r = halfwin - 1
    n = (2 * r + 1) ** 2
    atot = box_blur(fringe * a, r) * n
    btot = box_blur(fringe * b, r) * n
    norm = box_blur(fringe, r) * n

    sel = fringe < threshfactor
    a2 = jnp.where(sel, atot / jnp.maximum(norm, 1e-9), a)
    b2 = jnp.where(sel, btot / jnp.maximum(norm, 1e-9), b)

    xo, yo, zo = cs.lab_to_xyz(L / 327.68, a2 / 327.68, b2 / 327.68, jnp)
    out = jnp.stack([
        iws[0, 0] * xo + iws[0, 1] * yo + iws[0, 2] * zo,
        iws[1, 0] * xo + iws[1, 1] * yo + iws[1, 2] * zo,
        iws[2, 0] * xo + iws[2, 1] * yo + iws[2, 2] * zo,
    ])
    return out * MAXVAL
