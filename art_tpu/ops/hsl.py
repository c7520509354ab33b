"""HSL equalizer (reference: iphsl.cc).

Flat curves H/S/L indexed by hue, applied in working-space YUV: hue-indexed
masks optionally smoothed with a luminance-guided filter (smoothing knob),
then S scales chroma through a log2lin response, L scales Y, H rotates hue.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import FlatCurve
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_hs, yuv_to_rgb
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import guided_filter

_TWO_PI = 2.0 * np.pi


def _log2lin(x, base):
    return (np.power(base, x) - 1.0) / (base - 1.0)


def plan(pp, ctx):
    h = pp.hsl
    if not h.enabled:
        return None
    hc = FlatCurve(h.hcurve, periodic=True)
    sc = FlatCurve(h.scurve, periodic=True)
    lc = FlatCurve(h.lcurve, periodic=True)
    if hc.is_identity() and sc.is_identity() and lc.is_identity():
        return None
    # hue-indexed LUTs over [0,1) hue
    data = {}
    active = []
    for name, curve in (("h", hc), ("s", sc), ("l", lc)):
        if curve.is_identity():
            active.append(False)
            continue
        active.append(True)
        data[f"{name}coeffs"] = fit_curve(curve.lut(65536))
    smooth = 10.0 ** min(max(h.smoothing / 10.0, 0.0), 1.0) - 1.0
    radius = int(4 * smooth + 0.5)
    lradius = int(25 * smooth + 0.5)
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data["lum_w"] = lum_w.astype(np.float32)
    # the S strength response curve (iphsl.cc coeff FlatCurve)
    coeff = FlatCurve([1, 0.25, 0.0, 0.5, 0.18, 1, 1, 0, 0.35],
                      periodic=False)
    data["scoeff_resp"] = fit_curve(coeff.lut(65536))
    return (tuple(active), radius, lradius), data


def _tolin(y, base):
    v = (y - 0.5) * 2.0
    return jnp.sign(v) * jnp.clip(
        (jnp.power(base, jnp.abs(v)) - 1.0) / (base - 1.0), 0.0, 1.0)


def _hue01(hgl):
    v = hgl / _TWO_PI
    return jnp.where(v < 0, 1.0 + v, jnp.where(v > 1.0, v - 1.0, v))


def apply(rgb, data, static):
    active, radius, lradius = static
    lw = data["lum_w"]
    x = rgb / MAXVAL
    y, u, v = rgb_to_yuv(x, lw)
    hgl, s = yuv_to_hs(u, v)
    hue = _hue01(hgl)

    def masked(coeffs, rad, eps):
        f = eval_curve(hue, coeffs, in_max=1.0, out_max=1.0)
        if rad > 0:
            f = guided_filter(y, f, rad, eps)
        return f

    if active[1]:  # saturation
        f = _tolin(masked(data["scoeffs"], radius, 0.001), 2.0)
        resp = eval_curve(s, data["scoeff_resp"], in_max=1.0, out_max=1.0)
        sexp = 1.0 + jnp.where(f < 0, resp, 1.0 - resp)
        s = s * (1.0 + jnp.sign(f)
                 * jnp.power(jnp.clip(jnp.abs(f), 0.0, 1.0), sexp))
    if active[2]:  # luminance
        f = 1.0 + _tolin(masked(data["lcoeffs"], lradius, 0.0001), 10.0)
        y = y * f
    if active[0]:  # hue shift
        f = _tolin(masked(data["hcoeffs"], radius, 0.001), 32.0) * jnp.pi
        hgl = hgl + f

    u, v = s * jnp.cos(hgl), s * jnp.sin(hgl)
    out = yuv_to_rgb(y, u, v, lw)
    return out * MAXVAL
