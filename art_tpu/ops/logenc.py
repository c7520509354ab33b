"""Log encoding (reference: iplogenc.cc log_encode :~170-300).

ACES-style Lin_to_Log2 on a pixel norm (power_norm/luminance mix), with
optional highlight compression, saturation control and a guided-filter
regularization that encodes a blurred norm and reapplies detail as a ratio.
Auto gain/gray estimation (getAutoLog) runs in the pipeline driver when
``auto_gain``/``auto_gray`` are set and statistics are available.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import guided_filter

_NOISE = 2.0 ** -16
_LOG2 = np.log(2.0)


def _find_gray(source_gray, target_gray):
    """Solve (base^sg - 1)/(base - 1) = tg by bisection (iplogenc.cc:38)."""
    if source_gray <= 0:
        return 0.0
    lo, hi = 1.001, 1e7
    for _ in range(100):
        mid = np.sqrt(lo * hi)  # geometric bisection for huge range
        val = (mid ** source_gray - 1.0) / (mid - 1.0)
        if abs(val - target_gray) < 1e-7:
            return mid
        if val > target_gray:
            lo = mid
        else:
            hi = mid
    return mid


def plan(pp, ctx):
    lp = pp.logenc
    if not lp.enabled:
        return None
    gray = 2.0 ** (-lp.gain + np.log2(0.18))
    dynamic_range = max(lp.white_ev - lp.black_ev, 0.5)
    b = 0.0
    if 1 < lp.target_gray < 100 and dynamic_range > 0:
        b = _find_gray(abs(lp.black_ev) / dynamic_range,
                       lp.target_gray / 100.0)
    linbase = max(b, 0.0)
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    hl = min(max(lp.highlight_compression / 100.0, 0.0), 1.0)
    reg_radius = 0
    if lp.regularization > 0:
        reg_radius = max(1, int(25 * lp.regularization / 100.0))
    data = {
        "gray": np.float32(gray),
        "shadows_range": np.float32(lp.black_ev),
        "dynamic_range": np.float32(dynamic_range),
        "linbase": np.float32(linbase),
        "lum_w": lum_w.astype(np.float32),
        "hl_factor": np.float32(hl),
    }
    return (bool(lp.satcontrol), hl > 0, reg_radius), data


def _power_norm(r, g, b):
    r, g, b = jnp.abs(r), jnp.abs(g), jnp.abs(b)
    r2, g2, b2 = r * r, g * g, b * b
    d = r2 + g2 + b2
    n = r * r2 + g * g2 + b * b2
    return n / jnp.maximum(d, 1e-12)


def _norm(rgb01, lw):
    pn = _power_norm(rgb01[0], rgb01[1], rgb01[2])
    lum = lw[0] * rgb01[0] + lw[1] * rgb01[1] + lw[2] * rgb01[2]
    return jnp.minimum(np.finfo(np.float32).max / 100.0, pn / 2 + lum / 2)


def _encode(m, data, has_hl):
    gray = data["gray"]
    x = jnp.maximum(m, _NOISE)
    x = jnp.maximum(x / gray, _NOISE)
    if has_hl:
        hlf = jnp.maximum(data["hl_factor"], 0.1)
        compr_l, compr_t = 1.01, 0.8
        compr_s = (compr_l - compr_t) / (
            jnp.power(jnp.power((1.0 - compr_t) / (compr_l - compr_t),
                                -hlf), 1.0 / hlf) - 1.0)
        n = (x - compr_t) / compr_s
        d = jnp.power(1.0 + jnp.power(jnp.maximum(n, 0.0), hlf), 1.0 / hlf)
        res = compr_t + compr_s * n / d
        res = jnp.where(data["hl_factor"] < 0.1,
                        data["hl_factor"] * 10.0 * res
                        + (1 - data["hl_factor"] * 10.0) * x, res)
        x = jnp.where(x < compr_t, x, res)
    x = jnp.maximum(
        (jnp.log(x) / _LOG2 - data["shadows_range"]) / data["dynamic_range"],
        _NOISE)
    linbase = data["linbase"]
    x = jnp.where(linbase > 0,
                  (jnp.power(jnp.maximum(linbase, 1.0001), x) - 1.0)
                  / jnp.maximum(linbase - 1.0, 1e-4), x)
    return x


def apply(rgb, data, static):
    satcontrol, has_hl, reg_radius = static
    lw = data["lum_w"]
    x = rgb / MAXVAL
    m = _norm(x, lw)
    if reg_radius > 0:
        # regularized: encode a smoothed norm, carry detail as a ratio
        y = jnp.maximum(m, 1e-5)
        ys = guided_filter(jnp.log(y), jnp.log(y), reg_radius, 0.01)
        ys = jnp.exp(ys)
        detail = m / jnp.maximum(ys, 1e-9)
        mm = _encode(ys, data, has_hl) * detail
    else:
        mm = _encode(m, data, has_hl)
    f = jnp.where(m > _NOISE, mm / jnp.maximum(m, _NOISE), 1.0)
    out = x * f[None]
    if satcontrol:
        ll = lw[0] * out[0] + lw[1] * out[1] + lw[2] * out[2]
        d = out - ll[None]

        def sf(s, c):
            return jnp.where(c > _NOISE,
                             1.0 - jnp.minimum(jnp.abs(s) / jnp.maximum(
                                 c, _NOISE), 1.0), 0.0)

        smax = jnp.maximum(jnp.maximum(sf(d[0], out[0]), sf(d[1], out[1])),
                           sf(d[2], out[2]))
        s = smax * (jnp.power(jnp.maximum(f, 1e-9), 0.3) * 0.6 + 0.4) + (
            1 - smax) * 1.0
        s = jnp.where(f < 1.0, s, 1.0)
        out = ll[None] + s[None] * d
    return out * MAXVAL
