"""Masked color correction (reference: ipcolorcorrection.cc).

Per-region ASC-CDL-style slope/offset/power/pivot/compression with modes
YUV / RGB / Jzazbz / HSL (+LUT), hue shift and in/out saturation, applied
in working-space YUV and blended per-region by the generated L/ab masks.
Region params come from the `.arp` "ColorCorrection" group's suffixed keys
(the group lives in ProcParams.extra verbatim).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color import jzazbz as jzmod
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
from art_tpu.core.image import MAXVAL
from art_tpu.masks import MaskSpec, eval_mask, plan_mask
from art_tpu.params.keyfile import KeyFile

GROUP = "ColorCorrection"


def _kf_from_extra(pp):
    kf = KeyFile()
    if GROUP in pp.extra:
        kf.groups[GROUP] = dict(pp.extra[GROUP])
    return kf


def _log2lin(x, base):
    return np.sign(x) * (np.power(base, abs(x)) - 1.0) / (base - 1.0)


def plan(pp, ctx):
    kf = _kf_from_extra(pp)
    if GROUP not in kf.groups or not kf.get_bool(GROUP, "Enabled", False):
        return None
    ws = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    h, w = ctx.get("op_dims") or ctx["frame"].shape

    regions = []
    data = {"ws_lum": ws[1].astype(np.float32),
            "ws": ws.astype(np.float32),
            "iws": np.linalg.inv(ws).astype(np.float32)}
    j = 1
    while kf.has(GROUP, f"Mode_{j}") or kf.has(GROUP, f"Slope_{j}") or (
            j == 1 and kf.has(GROUP, "A_1")):
        sfx = f"_{j}"
        mode = kf.get_string(GROUP, "Mode" + sfx, "Jzazbz")
        a = kf.get_float(GROUP, "A" + sfx, 0.0)
        b = kf.get_float(GROUP, "B" + sfx, 0.0)
        in_sat = kf.get_float(GROUP, "InSaturation" + sfx, 0.0)
        out_sat = kf.get_float(GROUP, "OutSaturation" + sfx, 0.0)
        hueshift = kf.get_float(GROUP, "HueShift" + sfx, 0.0)
        rgbl = kf.get_bool(GROUP, "RGBLuminance" + sfx, False)

        rgbmode = mode in ("RGB", "HSL")
        slope = np.ones(3)
        offset = np.zeros(3)
        power = np.ones(3)
        pivot = np.ones(3)
        compression = np.zeros((3, 2))
        if mode == "HSL":
            # hue/sat wheels -> per-channel slope/offset/power
            # (ipcolorcorrection.cc:305-340)
            for c, nameof in enumerate(("Slope", "Offset", "Power")):
                hdeg = kf.get_float(GROUP, f"{nameof}H" + sfx, 0.0)
                sv = kf.get_float(GROUP, f"{nameof}S" + sfx, 0.0)
                fv = kf.get_float(GROUP, f"{nameof}L" + sfx, 0.0)
                hue = hdeg / 360.0
                sat = (sv / 100.0) ** 2.5
                f = fv / 100.0 + 1.0
                u = sat * np.cos(2 * np.pi * hue)
                v = sat * np.sin(2 * np.pi * hue)
                B = 0.5 - u
                R = v + 0.5
                G = (0.5 - R * ws[1][0] - B * ws[1][2]) / ws[1][1]
                RGB = np.array([R, G, B]) * 2.0
                if c == 0:
                    slope = RGB * f
                elif c == 1:
                    offset = RGB + f - 2.0
                else:
                    power = (2.0 - RGB) * (2.0 - f)
        else:
            def getv(name, dflt):
                single = kf.get_float(GROUP, name + sfx, dflt)
                out = []
                for ch in "RGB":
                    out.append(kf.get_float(GROUP, name + ch + sfx, single))
                return np.array(out)

            slope = getv("Slope", 1.0)
            offset = getv("Offset", 0.0)
            powr = getv("Power", 1.0)
            power = 1.0 / np.maximum(powr, 1e-6)
            pivot = getv("Pivot", 1.0)
            compr = getv("Compression", 0.0) * 100.0
            for c in range(3):
                if compr[c] > 0:
                    y0 = (np.power((slope[c] + offset[c]) / pivot[c],
                                   power[c]) * pivot[c])
                    compression[c] = (compr[c],
                                      np.log(1.0 + y0 * compr[c]) / slope[c])
            if not rgbmode:
                slope = np.full(3, slope[0])
                offset = np.full(3, offset[0])
                power = np.full(3, power[0])
                pivot = np.full(3, pivot[0])
                compression = np.stack([compression[0]] * 3)

        # ab wheel (abcoord2): log warp then hue/sat to uv
        aa = _log2lin(a, 4.0)
        bb = _log2lin(b, 4.0)
        hh = np.arctan2(bb, aa) / (2 * np.pi)
        ss = np.hypot(aa, bb)
        abcb = ss * np.cos(2 * np.pi * hh)  # u component
        abca = ss * np.sin(2 * np.pi * hh)  # v component

        mask = MaskSpec.from_keyfile(kf, GROUP, sfx)
        mstatic, mdata = plan_mask(mask, (h, w), pp)

        ridx = len(regions)
        data[f"cc{ridx}"] = {
            "slope": slope.astype(np.float32),
            "offset": (offset / 2.0).astype(np.float32),
            "power": power.astype(np.float32),
            "pivot": pivot.astype(np.float32),
            "compr": compression.astype(np.float32),
            "in_sat": np.float32(1.0 + in_sat / 100.0),
            "out_sat": np.float32(1.0 + out_sat / 100.0),
            "hueshift": np.float32(np.radians(hueshift)
                                   if mode != "RGB" else 0.0),
            "ab": np.array([abca, abcb], dtype=np.float32),
            "hsl_gamma": np.float32(
                kf.get_float(GROUP, "HSLGamma" + sfx, 2.4)),
            "mask": mdata,
        }
        regions.append((mode, rgbl, mstatic))
        j += 1
    if not regions:
        return None
    return tuple(regions), data


def _cdl_rgbmode(y, u, v, p, ws, iws, mode, rgbl):
    u = u * p["in_sat"]
    v = v * p["in_sat"]
    rgb = yuv_to_rgb(y, u, v, ws[1])
    use_gamma = mode == "HSL"
    vout = []
    for c in range(3):
        val = rgb[c] / MAXVAL
        if use_gamma:
            g = p["hsl_gamma"]
            val = jnp.where(val > 0, jnp.power(jnp.maximum(val, 1e-9),
                                               1.0 / g), val)
        val = val * p["slope"][c] + p["offset"][c]
        pw = jnp.power(jnp.maximum(val / p["pivot"][c], 1e-12),
                       p["power"][c]) * p["pivot"][c]
        val = jnp.where(val > 0, pw, 0.0)
        c0 = p["compr"][c][0]
        c1 = p["compr"][c][1]
        val = jnp.where(c0 != 0,
                        jnp.log(jnp.maximum(val, 0.0) * c0 + 1.0)
                        / jnp.where(c1 != 0, c1, 1.0), val)
        if use_gamma:
            g = p["hsl_gamma"]
            val = jnp.where(val > 0, jnp.power(jnp.maximum(val, 1e-9), g),
                            val)
        vout.append(val * MAXVAL)
    new_rgb = jnp.stack(vout)
    lw = ws[1]
    if rgbl:
        old = yuv_to_rgb(y, u, v, lw)
        max_ws = jnp.max(lw)
        f3 = max_ws / lw
        mixed = old + (new_rgb - old) * f3[:, None, None]
        y1 = lw[0] * mixed[0] + lw[1] * mixed[1] + lw[2] * mixed[2]
        f = jnp.where(y > 0, y1 / jnp.maximum(y, 1e-9), 1.0)
        u, v = u * f, v * f
        y = y1
    else:
        y, u, v = rgb_to_yuv(new_rgb, lw)
    fmax = jnp.maximum(y, 0.0)
    u = u + fmax * p["ab"][1]
    v = v + fmax * p["ab"][0]
    u = u * p["out_sat"]
    v = v * p["out_sat"]
    return y, u, v


def _cdl_yuvmode(y, u, v, p, ws, iws, is_jz):
    yy = (y / MAXVAL) * p["slope"][0] + p["offset"][0]
    pw = jnp.power(jnp.maximum(yy / p["pivot"][0], 1e-12),
                   p["power"][0]) * p["pivot"][0]
    yy = jnp.where(yy > 0, pw, 0.0)
    c0 = p["compr"][0][0]
    c1 = p["compr"][0][1]
    yy = jnp.where(c0 != 0,
                   jnp.log(jnp.maximum(yy, 0.0) * c0 + 1.0)
                   / jnp.where(c1 != 0, c1, 1.0), yy)
    yy = yy * MAXVAL
    f = jnp.where(y > 0, yy / jnp.maximum(y, 1e-9), 1.0)
    u2, v2 = u * f, v * f
    y2 = yy
    if is_jz:
        rgb = yuv_to_rgb(y2, u2, v2, ws[1])
        jz, az, bz = jzmod.xyz_to_jzazbz(
            *(ws[i, 0] * rgb[0] / MAXVAL + ws[i, 1] * rgb[1] / MAXVAL
              + ws[i, 2] * rgb[2] / MAXVAL for i in range(3)))
        y2, v2, u2 = jz, az, bz
    u2 = u2 * p["in_sat"]
    v2 = v2 * p["in_sat"]
    fmax = jnp.maximum(y2, 0.0)
    u2 = u2 + fmax * p["ab"][1]
    v2 = v2 + fmax * p["ab"][0]
    u2 = u2 * p["out_sat"]
    v2 = v2 * p["out_sat"]
    if is_jz:
        xj, yj, zj = jzmod.jzazbz_to_xyz(y2, v2, u2)
        iws_m = iws
        r = iws_m[0, 0] * xj + iws_m[0, 1] * yj + iws_m[0, 2] * zj
        g = iws_m[1, 0] * xj + iws_m[1, 1] * yj + iws_m[1, 2] * zj
        b = iws_m[2, 0] * xj + iws_m[2, 1] * yj + iws_m[2, 2] * zj
        y2, u2, v2 = rgb_to_yuv(jnp.stack([r, g, b]) * MAXVAL, ws[1])
    return y2, u2, v2


def _hueshift(y, u, v, hs):
    h = jnp.arctan2(v, u) + hs
    s = jnp.hypot(u, v)
    return y, s * jnp.cos(h), s * jnp.sin(h)


def apply(rgb, data, static):
    ws = data["ws"]
    iws = data["iws"]
    lw = data["ws_lum"]
    y, u, v = rgb_to_yuv(rgb, lw)
    for ridx, (mode, rgbl, mstatic) in enumerate(static):
        p = data[f"cc{ridx}"]
        mask = eval_mask(rgb, ws, mstatic, p["mask"])
        y2, u2, v2 = y, u, v
        if mode != "RGB":
            y2, u2, v2 = _hueshift(y2, u2, v2, p["hueshift"])
        if mode in ("RGB", "HSL"):
            y2, u2, v2 = _cdl_rgbmode(y2, u2, v2, p,
                                      jnp.asarray(data["ws"]), iws, mode,
                                      rgbl)
        else:
            y2, u2, v2 = _cdl_yuvmode(y2, u2, v2, p,
                                      jnp.asarray(data["ws"]), iws,
                                      mode == "Jzazbz")
        y = mask * y2 + (1 - mask) * y
        u = mask * u2 + (1 - mask) * u
        v = mask * v2 + (1 - mask) * v
    return yuv_to_rgb(y, u, v, lw)
