"""PPG demosaic (Patterned Pixel Grouping, Alain Desbiolles).

Reference: ``rtengine/demosaic_algos.cc:51`` (ppg_demosaic). Three
phases, each expressed as whole-plane selects over the mosaic:

1. Green at R/B sites: 5-tap directional estimates, direction chosen by
   a 3x-weighted gradient + 2x-weighted far-green term, median-clamped
   against the chosen direction's green neighbors (:77-93).
2. R and B at green sites: linear color-difference interpolation along
   the row (for the horizontally-adjacent color) and the column (:100-110).
3. The opposite color at R/B sites: the two diagonals compete on a
   gradient score; a tie averages both guesses (:116-136).

The reference stores guesses in ints (``guess >> 2``); this runs in
float (documented deviation — the int truncation is sub-LSB at 16-bit
scale). Border (3px, border_interpolate) falls back to bilinear.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.ahd import _median3, _Shifter
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register

BORDER = 4


@register("ppg")
def ppg_demosaic(cfa, pattern, **kwargs):
    x = jnp.maximum(cfa, 0.0)
    h, w = x.shape
    mr, mg, mb = bayer_channel_masks(pattern, (h, w))
    rg_row = jnp.roll(mr, 1, axis=1) | jnp.roll(mr, -1, axis=1)
    s = _Shifter(x, 3)

    # phase 1 -- green at R/B sites. On those sites s(0,+-1)/s(+-1,0)
    # are greens and s(0,+-2)/s(+-2,0) repeat the center color.
    guess_h = (s(0, -1) + s(0, 0) + s(0, 1)) * 2.0 - s(0, -2) - s(0, 2)
    guess_v = (s(-1, 0) + s(0, 0) + s(1, 0)) * 2.0 - s(-2, 0) - s(2, 0)
    diff_h = (jnp.abs(s(0, -2) - s(0, 0)) + jnp.abs(s(0, 2) - s(0, 0))
              + jnp.abs(s(0, -1) - s(0, 1))) * 3.0 \
        + (jnp.abs(s(0, 3) - s(0, 1)) + jnp.abs(s(0, -3) - s(0, -1))) * 2.0
    diff_v = (jnp.abs(s(-2, 0) - s(0, 0)) + jnp.abs(s(2, 0) - s(0, 0))
              + jnp.abs(s(-1, 0) - s(1, 0))) * 3.0 \
        + (jnp.abs(s(3, 0) - s(1, 0)) + jnp.abs(s(-3, 0) - s(-1, 0))) * 2.0
    gh = _median3(guess_h * 0.25, s(0, 1), s(0, -1))
    gv = _median3(guess_v * 0.25, s(1, 0), s(-1, 0))
    g = jnp.where(mg, x, jnp.where(diff_h > diff_v, gv, gh))

    sg = _Shifter(g, 3)
    sx = s

    # phase 2 -- R/B at green sites via color differences along the
    # axis where that color sits (:100-110)
    horiz = jnp.clip(0.5 * (sx(0, -1) + sx(0, 1) + 2.0 * g
                            - sg(0, -1) - sg(0, 1)), 0.0, 65535.0)
    vert = jnp.clip(0.5 * (sx(-1, 0) + sx(1, 0) + 2.0 * g
                           - sg(-1, 0) - sg(1, 0)), 0.0, 65535.0)
    r_at_g = jnp.where(rg_row, horiz, vert)
    b_at_g = jnp.where(rg_row, vert, horiz)

    # phase 3 -- opposite color at R/B sites: two diagonals compete
    # (d = width+1 and width-1, :116-136)
    def diag(dy, dx):
        dd = jnp.abs(sx(-dy, -dx) - sx(dy, dx)) \
            + jnp.abs(sg(-dy, -dx) - g) + jnp.abs(sg(dy, dx) - g)
        gg = sx(-dy, -dx) + sx(dy, dx) + 2.0 * g - sg(-dy, -dx) - sg(dy, dx)
        return dd, gg

    d0, g0 = diag(1, 1)
    d1, g1 = diag(1, -1)
    opp = jnp.clip(
        jnp.where(d0 < d1, g0 * 0.5,
                  jnp.where(d0 > d1, g1 * 0.5, (g0 + g1) * 0.25)),
        0.0, 65535.0)

    r = jnp.where(mr, x, jnp.where(mg, r_at_g, opp))
    b = jnp.where(mb, x, jnp.where(mg, b_at_g, opp))
    rgb = jnp.stack([r, jnp.maximum(g, 0.0), b])

    bl = bayer_bilinear(cfa, pattern)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = ((yy >= BORDER) & (yy < h - BORDER)
             & (xx >= BORDER) & (xx < w - BORDER))
    return jnp.where(inner[None], rgb, bl)
