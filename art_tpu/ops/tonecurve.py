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

    mode = mode1
    if mode == "Perceptual":
        from art_tpu.color.ciecam02 import ViewingConditions
        from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

        work = ctx["working_profile"]
        w2x = MATRICES_RGB_TO_XYZ[work]
        p2x = MATRICES_RGB_TO_XYZ["ProPhoto"]
        contrast_value = _curve_contrast_value(lut)
        cmul = float(np.interp(contrast_value, _CF_X, _CF_Y))
        # viewing conditions of PerceptualToneCurve::init (curves.cc:765-
        # 771): yb=20, la=20, average surround, D50/ProPhoto white
        wp = p2x @ np.ones(3) * 100.0
        k = ViewingConditions(white=tuple(wp), la=20.0, yb=20.0).constants()
        cam = np.array([k["c"], k["nc"], k["n"], k["z"], k["fl"],
                        k["nbb"], k["ncb"], k["aw"], *k["d_rgb"]],
                       dtype=np.float32)
        data = {
            "coeffs": fit_curve(lut),
            "w2p": (np.linalg.inv(p2x) @ w2x).astype(np.float32),
            "p2w": (np.linalg.inv(w2x) @ p2x).astype(np.float32),
            "pws": p2x.astype(np.float32),
            "pws_inv": np.linalg.inv(p2x).astype(np.float32),
            "cam": cam,
            "cmul": np.float32(cmul),
            "strength": np.float32(
                np.clip(tc.perceptual_strength / 100.0, 0.0, 1.0)),
        }
        return ("perceptual", clip_first), data
    if mode == "Neutral":
        from art_tpu.ops import tonecurve_neutral

        static, data = tonecurve_neutral.plan_neutral(pp, ctx, lut, whitept)
        return ("neutral",) + static, data

    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {"coeffs": fit_curve(lut), "lum_w": lum_w.astype(np.float32)}
    return (mode.lower(), clip_first), data


# PerceptualToneCurve contrast->chroma-scaling handles (curves.cc:783)
_CF_X = (0.60, 0.70, 0.90, 0.99, 1.00, 1.07, 1.08, 1.11, 1.20, 1.30,
         1.80, 2.00)
_CF_Y = (0.70, 0.80, 0.94, 1.00, 1.00, 1.00, 1.00, 1.02, 1.08, 1.12,
         1.20, 1.22)


def _curve_contrast_value(lut):
    """calculateToneCurveContrastValue (curves.cc:390): best linear slope
    removed, then max midtone slope in gamma-encoded space."""
    n = len(lut)
    xs = np.linspace(0.0, 1.0, n)

    def g2(v):
        return np.where(v <= 0.0031308, v * 12.92,
                        1.055 * np.maximum(v, 0.0) ** (1 / 2.4) - 0.055)

    def ig2(v):
        return np.where(v <= 0.04045, v / 12.92,
                        ((v + 0.055) / 1.055) ** 2.4)

    genc = g2(np.interp(ig2(xs), xs, lut))

    def rms(k):
        return np.mean((genc - k * xs) ** 2)

    ks = np.linspace(0.1, 5.0, 200)
    k = ks[int(np.argmin([rms(kk) for kk in ks]))]

    def slope_at(tx, xd=0.07):
        y0 = np.interp(tx - xd, xs, genc) - k * (tx - xd)
        y1 = np.interp(tx + xd, xs, genc) - k * (tx + xd)
        return 1.0 + (y1 - y0) / (2 * xd)

    mid = max(slope_at(t) for t in (0.30, 0.35, 0.40, 0.45))
    edge = max(slope_at(t) for t in (0.20, 0.25, 0.50, 0.55))
    return mid * 0.7 + edge * 0.3


def _scurve(x):
    return jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) ** 2)


def _apply_perceptual(rgb, data):
    """PerceptualToneCurve::BatchApply (curves.cc:456) — luminance from
    the hue-stable (FilmLike) curve, chroma rescaled by the curve's
    contrast. Deviation: the chroma modulation runs in Jzazbz (our
    appearance space elsewhere) instead of CIECAM02 JCh; the saturated/
    shadow guards use equivalent normalized thresholds."""
    def _mat3(m, p):
        return jnp.stack([
            m[0, 0] * p[0] + m[0, 1] * p[1] + m[0, 2] * p[2],
            m[1, 0] * p[0] + m[1, 1] * p[1] + m[1, 2] * p[2],
            m[2, 0] * p[0] + m[2, 1] * p[1] + m[2, 2] * p[2]])

    coeffs = data["coeffs"]
    strength = data["strength"]
    x = jnp.clip(rgb, 0.0, MAXVAL)
    pro = jnp.clip(_mat3(data["w2p"], x), 0.0, MAXVAL)

    # out-of-gamut blue fix (ACES trick, curves.cc:500)
    r, g, b = pro[0], pro[1], pro[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe = jnp.where(c > 0, c, 1.0)
    h6 = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h6 = jnp.where(h6 < 0, h6 + 6.0, h6)
    hue = h6 * 60.0
    sat = jnp.where(mx > 0, c / jnp.maximum(mx, 1e-9), 0.0)
    dist = jnp.abs(hue - 250.0)
    xg = _scurve(jnp.clip(1.0 - jnp.maximum(dist - 20.0, 0.0) / 20.0, 0, 1))
    xx = _scurve(jnp.clip((sat - 0.65) / 0.35, 0.0, 1.0))
    gate = ((dist <= 40.0) & (sat >= 0.65)).astype(x.dtype) * xg * xx
    g = g * (1.0 - gate) + (0.94 * g + 0.06 * b) * gate
    pro = jnp.stack([r, g, b])

    std = _mat3(data["p2w"], _apply_std(pro, coeffs))
    adobe = _apply_filmlike(pro, coeffs)

    yr, yg, yb = 0.2880402, 0.7118741, 0.0000857
    old_y = yr * pro[0] + yg * pro[1] + yb * pro[2]
    new_y = yr * adobe[0] + yg * adobe[1] + yb * adobe[2]
    lcoef = new_y / jnp.maximum(old_y, 1e-5)
    scaled = jnp.clip(pro * lcoef, 0.0, MAXVAL)

    # chroma modulation in CIECAM02 JCh (curves.cc:571-680)
    from art_tpu.color import ciecam02 as cam02

    camv = data["cam"]
    k = {"c": camv[0], "nc": camv[1], "n": camv[2], "z": camv[3],
         "fl": camv[4], "nbb": camv[5], "ncb": camv[6], "aw": camv[7],
         "d_rgb": (camv[8], camv[9], camv[10])}
    pws = data["pws"]
    sp = scaled * (100.0 / MAXVAL)
    xc = pws[0, 0] * sp[0] + pws[0, 1] * sp[1] + pws[0, 2] * sp[2]
    yc = pws[1, 0] * sp[0] + pws[1, 1] * sp[1] + pws[1, 2] * sp[2]
    zc = pws[2, 0] * sp[0] + pws[2, 1] * sp[1] + pws[2, 2] * sp[2]
    J, C, hh = cam02.xyz_to_jch(xc, yc, zc, k, xp=jnp)
    cmul = data["cmul"]
    # saturated colors: ease the scaling off (C lolim 35 hilim 60)
    tsat = _scurve(jnp.clip((C - 35.0) / 25.0, 0.0, 1.0))
    cmul_px = cmul * ((1.0 - tsat) + 0.95 * tsat)
    # brighter areas: fade the extra shadow chroma (gamma Y 0.15..0.50)
    ny = jnp.where(new_y / MAXVAL <= 0.0031308, new_y / MAXVAL * 12.92,
                   1.055 * jnp.maximum(new_y / MAXVAL, 1e-9) ** (1 / 2.4)
                   - 0.055)
    tdark = _scurve(jnp.clip((ny - 0.15) / 0.35, 0.0, 1.0))
    cmul_px = cmul_px * (1.20 * (1.0 - tdark) + tdark)
    # near-black: fade scaling to 1 (J lolim 4 hilim 7)
    tblack = _scurve(jnp.clip((J - 4.0) / 3.0, 0.0, 1.0))
    cmul_px = (1.0 - tblack) + cmul_px * tblack

    x2, y2, z2 = cam02.jch_to_xyz(J, C * cmul_px, hh, k, xp=jnp)
    piv = data["pws_inv"]
    r2 = piv[0, 0] * x2 + piv[0, 1] * y2 + piv[0, 2] * z2
    g2 = piv[1, 0] * x2 + piv[1, 1] * y2 + piv[1, 2] * z2
    b2 = piv[2, 0] * x2 + piv[2, 1] * y2 + piv[2, 2] * z2
    pro2 = jnp.clip(jnp.stack([r2, g2, b2]) * (MAXVAL / 100.0),
                    0.0, MAXVAL)

    # limit saturation increase vs the hue-stable Adobe curve
    # (curves.cc:700-740): mix it back in where chroma scaling pushed
    # HSV saturation >20% past it
    def hsv_s(p):
        mx2 = jnp.maximum(jnp.maximum(p[0], p[1]), p[2])
        mn2 = jnp.minimum(jnp.minimum(p[0], p[1]), p[2])
        return jnp.where(mx2 > 0, (mx2 - mn2) / jnp.maximum(mx2, 1e-9),
                         0.0)

    s_new = hsv_s(pro2)
    s_adobe = hsv_s(adobe)
    sat_scale = jnp.where(s_adobe > 0, s_new / jnp.maximum(s_adobe, 1e-9),
                          1.0)
    tkeep = _scurve(jnp.clip((sat_scale - 1.0) / 0.2, 0.0, 1.0))
    keep = (1.0 - tkeep) + 0.2 * tkeep
    pro2 = keep[None] * pro2 + (1.0 - keep[None]) * adobe

    # non-finite guard (rim-of-gamut colors): fall back to the curve
    bad = ~jnp.isfinite(pro2).all(axis=0)
    pro2 = jnp.where(bad[None], jnp.clip(adobe, 0.0, MAXVAL), pro2)

    out = _mat3(data["p2w"], pro2)
    out = strength * out + (1.0 - strength) * std
    # hard clip fast paths (all-white / all-black from the adobe curve)
    white = jnp.all(adobe >= MAXVAL, axis=0)
    black = jnp.all(adobe <= 0.0, axis=0)
    out = jnp.where(white[None], MAXVAL, jnp.where(black[None], 0.0, out))
    return jnp.clip(out, 0.0, MAXVAL)


def apply(rgb, data, static):
    mode = static[0]
    if mode == "neutral":
        from art_tpu.ops import tonecurve_neutral

        return tonecurve_neutral.apply_neutral(rgb, data, static)
    clip_first = static[1]
    if clip_first:
        rgb = filmlike_clip(rgb)
    coeffs = data["coeffs"]
    if mode == "perceptual":
        return _apply_perceptual(rgb, data)
    if mode == "filmlike":
        return _apply_filmlike(rgb, coeffs)
    if mode == "luminance":
        return _apply_luminance(rgb, coeffs, data["lum_w"])
    if mode == "weightedstd":
        return _apply_weighted_std(rgb, coeffs)
    if mode == "satandvalueblending":
        return _apply_satandvalue(rgb, coeffs)
    return _apply_std(rgb, coeffs)
