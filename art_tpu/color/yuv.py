"""The reference's working-space YUV (color.h:783-816).

Y = working-space luminance; u = Y - B; v = R - Y. Hue/sat of (u, v):
h = atan2(v, u), s = hypot(u, v) (yuv2hsl / hsl2yuv).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_yuv(rgb, lum_w):
    y = lum_w[0] * rgb[0] + lum_w[1] * rgb[1] + lum_w[2] * rgb[2]
    u = y - rgb[2]
    v = rgb[0] - y
    return y, u, v


def yuv_to_rgb(y, u, v, lum_w):
    b = y - u
    r = v + y
    g = (y - r * lum_w[0] - b * lum_w[2]) / lum_w[1]
    return jnp.stack([r, g, b])


def yuv_to_hs(u, v):
    h = jnp.arctan2(v, u)
    s = jnp.hypot(u, v)
    return h, s


def hs_to_yuv(h, s):
    return s * jnp.cos(h), s * jnp.sin(h)
