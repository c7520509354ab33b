"""Pixel-shift 4-frame combine (reference: rtengine/pixelshift.cc:298).

Pentax/Sony pixel-shift bodies expose 4 frames with the sensor displaced
by one photosite between exposures — every scene position is sampled by
R, B and two Gs. The combine selects each channel from the frame whose
effective CFA color lands there and averages the two greens; where the
two green samples disagree beyond the noise model the scene moved, and
the pixel falls back to a demosaic of frame 0 (the reference's motion
mask, simplified: its per-pixel adaptive statistics become a single
normalized green-difference test + 3x3 dilation — documented deviation).

Frame offset order matches the reference grid: (0,0), (0,1), (1,1), (1,0).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from art_tpu.core.image import bayer_channel_masks

OFFSETS = ((0, 0), (0, 1), (1, 1), (1, 0))


def _shifted_masks(pattern, shape, dy, dx):
    """Channel masks of the CFA as seen by a frame displaced by (dy, dx)."""
    mr, mg, mb = bayer_channel_masks(pattern, shape)
    mr = jnp.roll(jnp.roll(mr, -dy, 0), -dx, 1)
    mg = jnp.roll(jnp.roll(mg, -dy, 0), -dx, 1)
    mb = jnp.roll(jnp.roll(mb, -dy, 0), -dx, 1)
    return mr, mg, mb


def pixelshift_combine(frames, pattern, motion_detect=True,
                       sigma_factor=0.08, demosaic_method="amaze",
                       **dem_kwargs):
    """frames: (4, H, W) scaled mosaics; returns (3, H, W) RGB."""
    f = jnp.maximum(frames, 0.0)
    _, h, w = f.shape

    r = jnp.zeros((h, w), f.dtype)
    b = jnp.zeros((h, w), f.dtype)
    g_sum = jnp.zeros((h, w), f.dtype)
    g_min = jnp.full((h, w), jnp.inf, f.dtype)
    g_max = jnp.full((h, w), -jnp.inf, f.dtype)
    for k, (dy, dx) in enumerate(OFFSETS):
        mr, mg, mb = _shifted_masks(pattern, (h, w), dy, dx)
        r = jnp.where(mr, f[k], r)
        b = jnp.where(mb, f[k], b)
        g_sum = g_sum + jnp.where(mg, f[k], 0.0)
        g_min = jnp.where(mg, jnp.minimum(g_min, f[k]), g_min)
        g_max = jnp.where(mg, jnp.maximum(g_max, f[k]), g_max)
    g = 0.5 * g_sum
    out = jnp.stack([r, g, b])

    if not motion_detect:
        return out

    # motion: the two green samples of a static scene agree to shot noise
    denom = jnp.maximum(g_max + g_min, 1.0)
    motion = (g_max - g_min) > sigma_factor * denom + 16.0
    motion = lax.reduce_window(motion, False, lax.bitwise_or, (3, 3),
                               (1, 1), "SAME")

    from art_tpu.demosaic import demosaic

    fallback = demosaic(f[0], pattern, demosaic_method, **dem_kwargs)
    return jnp.where(motion[None], fallback, out)
