"""Neutral tone curve mode (reference: NeutralToneCurve::BatchApply,
curves.cc:891-1010, ApplyState :854-889).

The default ART look: gamut compression toward the output space
(jedypod gamut-compress, parabolic variant), brightness-preserving curve
application, Jzazbz-based hue twists (red/blue) and saturation
compensation. Pure elementwise math — a single fused XLA region on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color import jzazbz
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL
from art_tpu.ops.tonecurve import filmlike_clip

# gamut compress constants (curves.cc:903-908, hand-tuned ART values)
_DL = np.array([1.1, 1.2, 1.5])
_TH = np.array([0.85, 0.75, 0.95])
_S = (1.0 - _TH) / np.sqrt(_DL - 1.0)


def _output_matrix_for(name: str):
    """Map an output profile name to primaries (RTv4_sRGB -> sRGB etc.)."""
    n = (name or "").lower()
    if "2020" in n:
        return cs.MATRICES_RGB_TO_XYZ["Rec2020"]
    if "adobe" in n:
        return cs.MATRICES_RGB_TO_XYZ["Adobe RGB"]
    if "prophoto" in n or "large" in n:
        return cs.MATRICES_RGB_TO_XYZ["ProPhoto"]
    if "acesp0" in n:
        return cs.MATRICES_RGB_TO_XYZ["ACESp0"]
    if "acesp1" in n or "ap1" in n:
        return cs.MATRICES_RGB_TO_XYZ["ACESp1"]
    return cs.MATRICES_RGB_TO_XYZ["sRGB"]


def _hue_of(rgb, ws):
    _, _, h = jzazbz.rgb_to_jzczhz(
        jnp.float32(rgb[0]), jnp.float32(rgb[1]), jnp.float32(rgb[2]),
        jnp.asarray(ws, dtype=jnp.float32))
    return float(h)


def plan_neutral(pp, ctx, lut, whitept):
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    iwork = np.linalg.inv(work)
    om = _output_matrix_for(pp.icm.output_profile)
    to_out = np.linalg.inv(om) @ work
    to_work = iwork @ om
    # hue anchors measured in Rec2020 (ApplyState ctor, curves.cc:878-889)
    hws = cs.MATRICES_RGB_TO_XYZ["Rec2020"]
    rhue = _hue_of((1.0, 0.0, 0.0), hws)
    bhue = _hue_of((0.0, 0.0, 1.0), hws)
    yhue = _hue_of((1.0, 1.0, 0.0), hws)
    ohue = _hue_of((1.0, 0.5, 0.0), hws)
    yrange = abs(ohue - yhue) * 0.8
    rrange = abs(ohue - rhue)
    data = {
        "coeffs": fit_curve(lut),
        "ws": work.astype(np.float32),
        "iws": iwork.astype(np.float32),
        "to_out": to_out.astype(np.float32),
        "to_work": to_work.astype(np.float32),
        "hues": np.array([rhue, bhue, yhue, rrange, rrange, yrange],
                         dtype=np.float32),
        "whitept": np.float32(whitept),
    }
    return (), data


def _mat3(m, rgb):
    return jnp.stack([
        m[0, 0] * rgb[0] + m[0, 1] * rgb[1] + m[0, 2] * rgb[2],
        m[1, 0] * rgb[0] + m[1, 1] * rgb[1] + m[1, 2] * rgb[2],
        m[2, 0] * rgb[0] + m[2, 1] * rgb[1] + m[2, 2] * rgb[2],
    ])


def _gauss(x, b, c):
    return jnp.exp(-((x - b) ** 2) / (2.0 * c * c))


def apply_neutral(rgb, data, static):
    coeffs = data["coeffs"]
    ws = data["ws"]
    iws = data["iws"]
    whitept = data["whitept"]
    hues = data["hues"]
    rhue, bhue, yhue, rrange, brange, yrange = (
        hues[0], hues[1], hues[2], hues[3], hues[4], hues[5])
    lmax = whitept * MAXVAL

    x = jnp.maximum(rgb / MAXVAL, 0.0)
    ilum, _, hue0 = jzazbz.rgb_to_jzczhz(x[0], x[1], x[2], ws)
    iy = (x[0] + x[1] + x[2]) / 3.0

    # gamut compression in output space
    o = _mat3(data["to_out"], x)
    ac = jnp.maximum(jnp.maximum(o[0], o[1]), o[2])
    aac = jnp.abs(ac)
    safe = jnp.where(aac > 0, aac, 1.0)
    d = jnp.where(ac != 0, (ac[None] - o) / safe[None], 0.0)
    th = jnp.asarray(_TH, dtype=rgb.dtype)[:, None, None]
    s = jnp.asarray(_S, dtype=rgb.dtype)[:, None, None]
    compr = s * jnp.sqrt(jnp.maximum(d - th, 0.0) + s * s / 4.0) - s * jnp.sqrt(s * s / 4.0) + th
    cd = jnp.where(d < th, d, compr)
    o = ac[None] - cd * aac[None]
    x = _mat3(data["to_work"], o)

    # brightness-preserving normalization + filmlike clip (no basecurve path)
    oy = (x[0] + x[1] + x[2]) / 3.0
    f = jnp.where(oy > 0, iy / jnp.where(oy > 0, oy, 1.0), 1.0)
    x = x * f
    x = filmlike_clip(x * MAXVAL, lmax) / MAXVAL

    # apply the composed curve per channel
    x = eval_curve(x * MAXVAL, coeffs) / MAXVAL

    jz, cz, hz = jzazbz.rgb_to_jzczhz(x[0], x[1], x[2], ws)

    # hue twists (curves.cc:1000-1010)
    hue_shift = 15.0 * (jnp.pi / 180.0) * _gauss(hue0, rhue, rrange)
    hue_shift = hue_shift - 5.0 * (jnp.pi / 180.0) * _gauss(hue0, bhue, brange)
    hue_shift = hue_shift * jnp.clip(
        (x[0] + x[1] + x[2]) / (3.0 * whitept), 0.0, 1.0)
    hue = hue0 + hue_shift

    # saturation compensation
    ccf = jnp.where(
        ilum > 1e-5,
        1.0 - jnp.clip(jz / jnp.maximum(ilum, 1e-5) - 1.0, 0.0, 1.0) * 0.2,
        1.0,
    )
    ccf = jnp.clip(ccf + 0.5 * _gauss(hue, yhue, yrange), 0.0, 1.0)
    sat = cz * ccf

    r, g, b = jzazbz.jzczhz_to_rgb(jz, sat, hue, iws)
    out = jnp.stack([r, g, b]) * MAXVAL
    return jnp.clip(out, 0.0, lmax)
