"""Tone equalizer (reference: iptoneequalizer.cc, darktable-derived).

5 bands spanning -16..+6 EV as 12 gaussian-windowed luma channels (std
2 EV); per-pixel correction = normalized sum of band gains at log2
luminance. Regularization smooths the luminance with a log-domain guided
filter and an optional posterize+re-guide step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import guided_filter

_CENTERS = np.array([-16.0, -14.0, -12.0, -10.0, -8.0, -6.0,
                     -4.0, -2.0, 0.0, 2.0, 4.0, 6.0], dtype=np.float32)


def _conv(v, lo, hi):
    f = lo if v < 0 else hi
    return 2.0 ** (v / 100.0 * f)


def plan(pp, ctx):
    te = pp.tone_equalizer
    if not te.enabled:
        return None
    bands = [te.band0, te.band1, te.band2, te.band3, te.band4]
    if all(b == 0 for b in bands):
        return None
    factors = np.array([
        _conv(bands[0], 2, 3)] * 5 + [
        _conv(bands[1], 2, 3),
        _conv(bands[2], 2.5, 2.5),
        _conv(bands[3], 3, 2)] + [
        _conv(bands[4], 3, 2)] * 4, dtype=np.float32)
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    detail = 5 if te.regularization > 0 else 0
    radius = int(detail + 0.5)
    epsilon = 0.01 + 0.002 * max(detail - 3, 0)
    data = {
        "factors": factors,
        "lum_w": lum_w.astype(np.float32),
        "gain": np.float32(1.0 / MAXVAL * 2.0 ** (-te.pivot)),
    }
    return (radius, float(epsilon), int(te.regularization)), data


def apply(rgb, data, static):
    radius, epsilon, regularization = static
    lw = data["lum_w"]
    gain = data["gain"]
    factors = data["factors"]
    centers = jnp.asarray(_CENTERS)

    r, g, b = rgb[0] * gain, rgb[1] * gain, rgb[2] * gain
    y = jnp.clip(lw[0] * r + lw[1] * g + lw[2] * b, 1e-5, 32.0)

    if radius > 0:
        # guidedFilterLog(10, ...) (log-domain self-guided)
        ly = jnp.log(y) / np.log(10.0)
        ly = guided_filter(ly, ly, radius, epsilon)
        y = jnp.power(10.0, ly)

    if regularization > 1:
        base_posterization = 5.0
        l = jnp.clip(jnp.log2(jnp.maximum(y, 1e-9)), _CENTERS[0],
                     _CENTERS[-1])
        ll = jnp.round(l * base_posterization) / base_posterization
        y2 = y
        y = jnp.power(2.0, ll)
        radius2 = 350
        y = guided_filter(y2, y, radius2, 0.004)
        reg = 5 - min(regularization, 4)
        if reg > 1:
            y = guided_filter(y2, y, radius2 * (reg - 1), 0.004 / 100)

    luma = jnp.clip(jnp.log2(jnp.maximum(y, 1e-30)), -14.0, 4.0)
    w_sum = float(np.sum(np.exp(-(_CENTERS ** 2) / 4.0)))
    correction = jnp.zeros_like(luma)
    for c in range(12):
        correction = correction + jnp.exp(
            -((luma - centers[c]) ** 2) / 4.0) * factors[c]
    correction = correction / w_sum
    return rgb * correction[None]
