"""Channel mixer (reference: ipchmixer.cc).

Two modes: RGB_MATRIX (3x3 / 1000) and PRIMARIES_CHROMA (four-color
Ohno-Hardis method tweaking primary hue/sat in xy chromaticity). Both
reduce to a 3x3 matrix at plan time; the device applies one muladd.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs

_D65_xy = (0.3127, 0.3290)


def _mixer_matrix_primaries(hue_tweak, sat_tweak, working_profile):
    """get_mixer_matrix (ipchmixer.cc:44-148)."""
    ws = cs.MATRICES_RGB_TO_XYZ[working_profile]
    white = np.array([_D65_xy[0], _D65_xy[1], 1 - _D65_xy[0] - _D65_xy[1]])

    def rgb2xy(rgb):
        xyz = ws @ rgb
        s = xyz.sum()
        if s == 0:
            return white.copy()
        x, y = xyz[0] / s, xyz[1] / s
        return np.array([x, y, 1 - x - y])

    def get_matrix(rxy, gxy, bxy, w):
        m = np.stack([rxy, gxy, bxy], axis=1)
        kr = np.linalg.inv(m) @ w
        return m @ np.diag(kr)

    rxy = rgb2xy(np.array([1.0, 0, 0]))
    gxy = rgb2xy(np.array([0, 1.0, 0]))
    bxy = rgb2xy(np.array([0, 0, 1.0]))
    M = get_matrix(rxy, gxy, bxy, white)

    def tweak(c, hue, sat, hrange, srange):
        x, y = c[0], c[1]
        dx, dy = x - _D65_xy[0], y - _D65_xy[1]
        radius = np.hypot(dx, dy)
        angle = np.degrees(np.arctan2(dy, dx))
        dh = hue / 100.0 * 360.0 * hrange
        ds = 1.0 + sat / 100.0 * srange
        radius *= ds
        angle += dh
        nx = _D65_xy[0] + radius * np.cos(np.radians(angle))
        ny = _D65_xy[1] + radius * np.sin(np.radians(angle))
        return np.array([nx, ny, 1 - nx - ny])

    N = get_matrix(
        tweak(rxy, hue_tweak[0], sat_tweak[0], 0.075, 0.3),
        tweak(gxy, hue_tweak[1], sat_tweak[1], 0.1, 0.5),
        tweak(bxy, hue_tweak[2], sat_tweak[2], 0.075, 0.5),
        white)
    try:
        Minv = np.linalg.inv(M)
    except np.linalg.LinAlgError:
        return np.eye(3)
    return N @ Minv


def plan(pp, ctx):
    cm = pp.chmixer
    if not cm.enabled:
        return None
    mode = getattr(cm, "mode", 0)
    hue = getattr(cm, "hue_tweak", [0, 0, 0])
    sat = getattr(cm, "sat_tweak", [0, 0, 0])
    if mode == 1 or (mode == "PRIMARIES_CHROMA"):
        mat = _mixer_matrix_primaries(hue, sat, ctx["working_profile"])
    else:
        mat = np.array([cm.red, cm.green, cm.blue], dtype=np.float64) / 1000.0
    if np.allclose(mat, np.eye(3)):
        return None
    return (), {"matrix": mat.astype(np.float32)}


def apply(rgb, data, static):
    m = data["matrix"]
    out = jnp.stack([
        m[0, 0] * rgb[0] + m[0, 1] * rgb[1] + m[0, 2] * rgb[2],
        m[1, 0] * rgb[0] + m[1, 1] * rgb[1] + m[1, 2] * rgb[2],
        m[2, 0] * rgb[0] + m[2, 1] * rgb[1] + m[2, 2] * rgb[2],
    ])
    return jnp.maximum(out, 0.0)
