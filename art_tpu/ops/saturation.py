"""Saturation / vibrance (reference: ipsaturation.cc:43-82)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs

_NOISE = 2.0 ** -16


def plan(pp, ctx):
    s = pp.saturation
    if not s.enabled or (s.saturation == 0 and s.vibrance == 0):
        return None
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {
        "sat": np.float32(1.0 + s.saturation / 100.0),
        "vib": np.float32(1.0 - s.vibrance / 1000.0),
        "lum_w": lum_w.astype(np.float32),
    }
    return (bool(s.vibrance),), data


def _vibrance(x, vib):
    ax = jnp.abs(x / 65535.0)
    out = jnp.sign(x) * jnp.power(jnp.maximum(ax, _NOISE), vib) * 65535.0
    return jnp.where(ax > _NOISE, out, x)


def apply(rgb, data, static):
    (has_vib,) = static
    w = data["lum_w"]
    l = w[0] * rgb[0] + w[1] * rgb[1] + w[2] * rgb[2]
    d = rgb - l[None]
    if has_vib:
        d = _vibrance(d, data["vib"])
    return jnp.maximum(l[None] + data["sat"] * d, _NOISE)
