"""Film negative inversion (reference: filmnegativeproc.cc doProcess:223).

out_c = min(mult_c * in_c^exp_c, MAXVAL), with per-channel exponents
exp = -(greenExp * ratio_c) (ratio_g = 1) and multipliers calibrated so
the reference input color maps to the reference output color:
mult_c = refOut_c / max(refIn_c, 1)^exp_c.

When the references are unset (<= 0 green), the reference estimates
refIn from the channel medians (20% border cut) and targets
refOut = MAXVAL/24 — we do the same with an in-graph median over a
subsampled interior (host-side data-dependent stats would force a
device round-trip at plan time).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAXVAL = 65535.0


def plan(pp, ctx):
    fn = pp.film_negative
    if not fn.enabled:
        return None
    gexp = float(fn.green_exp)
    exps = np.array([-(gexp * float(fn.red_ratio)),
                     -gexp,
                     -(gexp * float(fn.blue_ratio))], dtype=np.float32)
    ref_in = np.asarray(list(fn.ref_input) + [0.0] * 3, dtype=np.float32)[:3]
    ref_out = np.asarray(list(fn.ref_output) + [0.0] * 3,
                         dtype=np.float32)[:3]
    auto_in = bool(ref_in[1] <= 0.0)
    auto_out = bool(ref_out[1] <= 0.0)
    static = (auto_in,)
    data = {"exps": exps,
            "ref_in": ref_in,
            "ref_out": ref_out if not auto_out
            else np.full(3, MAXVAL / 24.0, dtype=np.float32)}
    return static, data


def apply(rgb, data, static):
    (auto_in,) = static
    exps = data["exps"][:, None, None]
    if auto_in:
        # channel medians with a 20% border cut, subsampled 4x each axis
        c, h, w = rgb.shape
        y0, y1 = int(h * 0.2), int(h * 0.8)
        x0, x1 = int(w * 0.2), int(w * 0.8)
        sub = rgb[:, y0:y1:4, x0:x1:4]
        ref_in = jnp.median(sub.reshape(c, -1), axis=1)
    else:
        ref_in = data["ref_in"]
    mult = data["ref_out"] / jnp.maximum(ref_in, 1.0) ** data["exps"]
    out = mult[:, None, None] * jnp.maximum(rgb, 0.0) ** exps
    return jnp.clip(out, 0.0, MAXVAL)
