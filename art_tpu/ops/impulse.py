"""Impulse (salt & pepper) denoise (reference: impulse_denoise.cc +
rt_algo.cc markImpulse).

Detection: |L - gauss(L)| compared against the 5x5 neighborhood average of
the high-pass magnitude. Replacement: range-weighted average over the 5x5
non-impulsive neighbors. Works in Lab (L drives detection and weights).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import box_blur, gauss_blur


def plan(pp, ctx):
    ip = pp.impulse_denoise
    if not ip.enabled:
        return None
    thresh = ip.thresh / 20.0
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    data = {
        "ws": work.astype(np.float32),
        "iws": np.linalg.inv(work).astype(np.float32),
        "sigma": np.float32(max(2.0, thresh - 1.0)),
        "impthr_div24": np.float32(max(1.0, 5.5 - thresh) / 24.0),
    }
    return (float(max(2.0, thresh - 1.0)),), data


def apply(rgb, data, static):
    (sigma,) = static
    ws = data["ws"]
    x = rgb / MAXVAL
    xx = ws[0, 0] * x[0] + ws[0, 1] * x[1] + ws[0, 2] * x[2]
    yy = ws[1, 0] * x[0] + ws[1, 1] * x[1] + ws[1, 2] * x[2]
    zz = ws[2, 0] * x[0] + ws[2, 1] * x[1] + ws[2, 2] * x[2]
    L, a, b = cs.xyz_to_lab(xx, yy, zz, jnp)
    L = L * 327.68  # reference Lab scaling

    lpf = gauss_blur(L, sigma)
    hp = jnp.abs(L - lpf)
    nbr = box_blur(hp, 2) * 25.0  # 5x5 sum
    imp = hp > (nbr - hp) * data["impthr_div24"]

    # replacement: range-weighted mean over non-impulsive 5x5 neighbors
    eps = 1.0
    ok = (~imp).astype(L.dtype)
    pad = lambda t: jnp.pad(t, 2, mode="edge")
    Lp, ap, bp, okp = pad(L), pad(a), pad(b), pad(ok)
    h, w = L.shape
    norm = jnp.zeros_like(L)
    sl = jnp.zeros_like(L)
    sa = jnp.zeros_like(L)
    sb = jnp.zeros_like(L)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            Ln = Lp[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]
            an = ap[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]
            bn = bp[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]
            on = okp[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]
            wt = on / ((Ln - L) ** 2 + eps)
            norm = norm + wt
            sl = sl + wt * Ln
            sa = sa + wt * an
            sb = sb + wt * bn
    valid = norm > 0
    Lr = jnp.where(imp & valid, sl / jnp.maximum(norm, 1e-9), L)
    ar = jnp.where(imp & valid, sa / jnp.maximum(norm, 1e-9), a)
    br = jnp.where(imp & valid, sb / jnp.maximum(norm, 1e-9), b)

    xo, yo, zo = cs.lab_to_xyz(Lr / 327.68, ar, br, jnp)
    iws = data["iws"]
    out = jnp.stack([
        iws[0, 0] * xo + iws[0, 1] * yo + iws[0, 2] * zo,
        iws[1, 0] * xo + iws[1, 1] * yo + iws[1, 2] * zo,
        iws[2, 0] * xo + iws[2, 1] * yo + iws[2, 2] * zo,
    ])
    return out * MAXVAL
