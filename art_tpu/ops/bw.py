"""Black & white conversion (reference: ipbw.cc:214-367).

Per-channel gamma pre-curves, weighted channel mix (computeBWMixerConstants
handles setting/filter presets), optional YUV color cast driven by a film
curve + saturation curve on luminance.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import DiagonalCurve, FlatCurve
from art_tpu.core.curve1d import eval_curve, fit_curve, fit_curves
from art_tpu.core.image import MAXVAL

# color filter presets: equivalent RGB weights multipliers
# (subset of Color::computeBWMixerConstants's filter table)
_FILTERS = {
    "None": (1.0, 1.0, 1.0),
    "Red": (1.0, 0.05, 0.0),
    "Orange": (1.0, 0.42, 0.0),
    "Yellow": (1.0, 1.0, 0.0),
    "YellowGreen": (0.25, 1.0, 0.0),
    "GreenYellow": (0.25, 1.0, 0.0),
    "Green": (0.0, 1.0, 0.0),
    "Cyan": (0.0, 1.0, 1.0),
    "Blue": (0.0, 0.05, 1.0),
    "Purple": (1.0, 0.0, 1.0),
}


def _mixer_weights(setting, filter_, mr, mg, mb):
    """Weighted mix normalization (computeBWMixerConstants essentials):
    relative settings normalize the weights to sum 1; absolute keep /100."""
    w = np.array([mr, mg, mb], dtype=np.float64)
    f = np.array(_FILTERS.get(filter_, (1.0, 1.0, 1.0)))
    w = w * f
    if setting.endswith("Abs"):
        return w / 100.0
    s = w.sum()
    if abs(s) < 1e-6:
        return np.array([0.33, 0.33, 0.34])
    return w / s


def plan(pp, ctx):
    bwp = pp.bw
    if not bwp.enabled:
        return None
    weights = _mixer_weights(bwp.setting, bwp.filter_, bwp.mixer_red,
                             bwp.mixer_green, bwp.mixer_blue)

    gammas = []
    for g in (bwp.gamma_red, bwp.gamma_green, bwp.gamma_blue):
        gamval = 125.0 if g >= 0 else 100.0
        gammas.append(1.0 - g / gamval)
    has_gamma = any(abs(g - 1.0) > 1e-6 for g in gammas)
    gcoeffs = None
    if has_gamma:
        x = np.linspace(0.0, 1.0, 65536)
        gcoeffs = fit_curves([np.power(x, g) for g in gammas])

    # color cast (ipbw.cc:318-365)
    cast = list(bwp.color_cast) + [0, 0]
    cast_sat = cast[1]
    cast_data = None
    if cast_sat > 0:
        s = (cast_sat / 100.0) ** 3
        hue = cast[0] / 180.0 * np.pi
        filmcurve = DiagonalCurve([
            4, 0.0, 0.0, 0.35, 0.15, 0.65, 0.85, 1.0, 1.0])  # approx film
        satcurve = FlatCurve([1, 0, 0, 0.35, 0, 0.5, 1, 0.35, 0.35,
                              1, 0, 0, 0.35], periodic=False)
        x = np.linspace(0.0, 1.0, 65536)
        xe = cs.srgb_gamma(x, np)
        yv = filmcurve.get_val(xe)
        cv = satcurve.get_val(xe)
        u = s * cv * np.cos(hue) * yv
        v = s * cv * np.sin(hue) * yv
        cast_data = {
            "ucoeffs": fit_curve(u),
            "vcoeffs": fit_curve(v),
        }

    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {
        "weights": weights.astype(np.float32),
        "lum_w": lum_w.astype(np.float32),
    }
    if gcoeffs is not None:
        data["gcoeffs"] = gcoeffs
    if cast_data:
        data.update(cast_data)
    return (has_gamma, cast_data is not None), data


def apply(rgb, data, static):
    has_gamma, has_cast = static
    r, g, b = rgb[0], rgb[1], rgb[2]
    if has_gamma:
        gc = data["gcoeffs"]
        r = eval_curve(r, gc[0])
        g = eval_curve(g, gc[1])
        b = eval_curve(b, gc[2])
    w = data["weights"]
    bwv = w[0] * r + w[1] * g + w[2] * b
    out = jnp.stack([bwv, bwv, bwv])
    if has_cast:
        lw = data["lum_w"]
        y = lw[0] * out[0] + lw[1] * out[1] + lw[2] * out[2]
        du = eval_curve(y, data["ucoeffs"], out_max=MAXVAL)
        dv = eval_curve(y, data["vcoeffs"], out_max=MAXVAL)
        # yuv: u = Y - B, v = R - Y; adding (du, dv) tints shadows/highlights
        bb = out[2] - du
        rr = out[0] + dv
        gg = (y - rr * lw[0] - bb * lw[2]) / lw[1]
        out = jnp.stack([rr, gg, bb])
    return jnp.maximum(out, 0.0)
