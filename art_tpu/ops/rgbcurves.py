"""Per-channel RGB curves (reference: iprgbcurves.cc).

Curves are authored in sRGB-gamma space and applied to linear data
(RGBCurve, iprgbcurves.cc:29-57) — identical domain handling to the tone
curve, so the planner reuses `adjust_user_curve` and fits a 64-segment
device curve per channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.core.curve1d import eval_curve, fit_curves
from art_tpu.ops.tonecurve import adjust_user_curve


def plan(pp, ctx):
    rc = pp.rgb_curves
    if not rc.enabled:
        return None
    luts = [adjust_user_curve(c) for c in (rc.rcurve, rc.gcurve, rc.bcurve)]
    if all(l is None for l in luts):
        return None
    ident = np.linspace(0.0, 1.0, 65536, dtype=np.float32)
    coeffs = fit_curves([(l if l is not None else ident)
                       for l in luts])
    active = tuple(l is not None for l in luts)
    return (active,), {"coeffs": coeffs}


def apply(rgb, data, static):
    (active,) = static
    coeffs = data["coeffs"]
    chans = []
    for c in range(3):
        if active[c]:
            chans.append(eval_curve(rgb[c], coeffs[c]))
        else:
            chans.append(rgb[c])
    return jnp.stack(chans)
