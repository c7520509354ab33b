"""JDL demosaic (Joint Demosaicing and Denoising, Luis Sanz Rodriguez).

Reference: ``rtengine/demosaic_algos.cc:360`` (jdl_interpolate_omp).
Four passes over chroma (G - C) planes, each a whole-plane stencil:

1. Directional green-minus-color candidates at R/B sites: 7-tap
   weighted green estimates per cardinal direction, fused by
   gradient-reciprocal weights into a vertical and a horizontal
   chroma candidate (:396-410).
2. Own-site chroma: a high-order coherence score (the 78/69/51/21 minus
   6/10/7 quadratic form over a 13-tap chroma column/row) picks between
   the median-damped vertical and horizontal candidates (:416-424).
3. Opposite chroma at R/B sites from the 4 diagonal neighbors'
   own-chroma (gradient-reciprocal weights + 3-point medians), which
   also produces G and the opposite color (:430-445).
4. R and B at green sites from the 4 cardinal neighbors' chroma planes
   (0.875/0.125 near/far blend, :451-464).

The reference quantizes ``dif``/``chr`` to int; this stays in float
(documented deviation, sub-LSB at 16-bit scale). Border (6px) falls
back to bilinear.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.ahd import _median3, _Shifter
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register

BORDER = 8


@register("jdl")
def jdl_demosaic(cfa, pattern, **kwargs):
    x = jnp.maximum(cfa, 0.0)
    h, w = x.shape
    mr, mg, mb = bayer_channel_masks(pattern, (h, w))
    s = _Shifter(x, 6)

    # pass 1 -- directional candidates at R/B sites (:396-410). Along
    # a row/column from an R/B site, odd offsets are greens and even
    # offsets repeat the center color.
    def cand(dy, dx):
        g1, g3, g5 = s(dy, dx), s(3 * dy, 3 * dx), s(5 * dy, 5 * dx)
        c2, c4 = s(2 * dy, 2 * dx), s(4 * dy, 4 * dx)
        f = 1.0 + jnp.abs(g1 - g3) + jnp.abs(g1 - s(-dy, -dx)) \
            + jnp.abs(s(0, 0) - c2) + jnp.abs(c2 - c4)
        g = jnp.clip((22.0 * g1 + 22.0 * g3 + 2.0 * g5 + 2.0 * s(-dy, -dx)
                      + 40.0 * s(0, 0) - 32.0 * c2 - 8.0 * c4) / 48.0,
                     0.0, 65535.0)
        return f, g

    fN, gN = cand(-1, 0)
    fS, gS = cand(1, 0)
    fE, gE = cand(0, 1)
    fW, gW = cand(0, -1)
    dif_v = jnp.clip((fS * gN + fN * gS) / (fN + fS), 0.0, 65535.0) - s(0, 0)
    dif_h = jnp.clip((fW * gE + fE * gW) / (fE + fW), 0.0, 65535.0) - s(0, 0)

    sv = _Shifter(dif_v, 6)
    sh = _Shifter(dif_h, 6)

    # pass 2 -- own-site chroma (:416-424): coherence of the chroma
    # run along the candidate's axis (same-color sites sit at +-2)
    def coherence(sd, dy, dx):
        d0 = sd(0, 0)
        dm2, dp2 = sd(-2 * dy, -2 * dx), sd(2 * dy, 2 * dx)
        dm4, dp4 = sd(-4 * dy, -4 * dx), sd(4 * dy, 4 * dx)
        dm6, dp6 = sd(-6 * dy, -6 * dx), sd(6 * dy, 6 * dx)
        sq = jnp.square
        f = (1.0 + 78.0 * sq(d0) + 69.0 * (sq(dm2) + sq(dp2))
             + 51.0 * (sq(dm4) + sq(dp4)) + 21.0 * (sq(dm6) + sq(dp6))
             - 6.0 * sq(dm2 + d0 + dp2)
             - 10.0 * (sq(dm4 + dm2 + d0) + sq(d0 + dp2 + dp4))
             - 7.0 * (sq(dm6 + dm4 + dm2) + sq(dp2 + dp4 + dp6)))
        # the form is +1 on constant chroma but float32 cancellation at
        # hard edges can reach exactly 0 on both axes -> 0/0; floor it
        return jnp.maximum(f, 1e-3)

    f0 = coherence(sv, 1, 0)
    f1 = coherence(sh, 0, 1)
    g0 = _median3(0.725 * sv(0, 0) + 0.1375 * sv(-2, 0) + 0.1375 * sv(2, 0),
                  sv(-2, 0), sv(2, 0))
    g1 = _median3(0.725 * sh(0, 0) + 0.1375 * sh(0, -2) + 0.1375 * sh(0, 2),
                  sh(0, -2), sh(0, 2))
    chr_own = (f1 * g0 + f0 * g1) / (f0 + f1)

    # pass 3 -- opposite chroma from the 4 diagonal own-chromas
    # (:430-445); diagonal neighbors of an R site are B sites and
    # vice versa, so one plane serves both reads
    a = _Shifter(chr_own, 6)
    f0 = 1.0 / (1.0 + jnp.abs(a(-1, -1) - a(1, 1))
                + jnp.abs(a(-1, -1) - a(-3, -3)) + jnp.abs(a(1, 1) - a(-3, -3)))
    f1 = 1.0 / (1.0 + jnp.abs(a(-1, 1) - a(1, -1))
                + jnp.abs(a(-1, 1) - a(-3, 3)) + jnp.abs(a(1, -1) - a(-3, 3)))
    f2 = 1.0 / (1.0 + jnp.abs(a(1, -1) - a(-1, 1))
                + jnp.abs(a(1, -1) - a(3, 3)) + jnp.abs(a(-1, 1) - a(3, -3)))
    f3 = 1.0 / (1.0 + jnp.abs(a(1, 1) - a(-1, -1))
                + jnp.abs(a(1, 1) - a(3, -3)) + jnp.abs(a(-1, -1) - a(3, 3)))
    g0 = _median3(a(-1, -1), a(-3, -1), a(-1, -3))
    g1 = _median3(a(-1, 1), a(-3, 1), a(-1, 3))
    g2 = _median3(a(1, -1), a(3, -1), a(1, -3))
    g3 = _median3(a(1, 1), a(3, 1), a(1, 3))
    chr_other = (f0 * g0 + f1 * g1 + f2 * g2 + f3 * g3) / (f0 + f1 + f2 + f3)

    g = jnp.where(mg, x, jnp.clip(x + chr_own, 0.0, 65535.0))
    other = jnp.clip(g - chr_other, 0.0, 65535.0)  # B at R sites, R at B

    # pass 4 -- R/B at green sites (:451-464): per-chroma planes are
    # complete at every non-green site after passes 2+3
    chr0 = jnp.where(mr, chr_own, chr_other)  # G - R
    chr1 = jnp.where(mb, chr_own, chr_other)  # G - B

    def green_site(chrp):
        cc = _Shifter(chrp, 6)
        f0 = 1.0 / (1.0 + jnp.abs(cc(-1, 0) - cc(1, 0))
                    + jnp.abs(cc(-1, 0) - cc(-3, 0))
                    + jnp.abs(cc(1, 0) - cc(-3, 0)))
        f1 = 1.0 / (1.0 + jnp.abs(cc(0, 1) - cc(0, -1))
                    + jnp.abs(cc(0, 1) - cc(0, 3))
                    + jnp.abs(cc(0, -1) - cc(0, 3)))
        f2 = 1.0 / (1.0 + jnp.abs(cc(0, -1) - cc(0, 1))
                    + jnp.abs(cc(0, -1) - cc(0, -3))
                    + jnp.abs(cc(0, 1) - cc(0, -3)))
        f3 = 1.0 / (1.0 + jnp.abs(cc(1, 0) - cc(-1, 0))
                    + jnp.abs(cc(1, 0) - cc(3, 0))
                    + jnp.abs(cc(-1, 0) - cc(3, 0)))
        g0 = 0.875 * cc(-1, 0) + 0.125 * cc(-3, 0)
        g1 = 0.875 * cc(0, 1) + 0.125 * cc(0, 3)
        g2 = 0.875 * cc(0, -1) + 0.125 * cc(0, -3)
        g3 = 0.875 * cc(1, 0) + 0.125 * cc(3, 0)
        est = (f0 * g0 + f1 * g1 + f2 * g2 + f3 * g3) / (f0 + f1 + f2 + f3)
        return jnp.clip(x - est, 0.0, 65535.0)  # x == G at green sites

    r = jnp.where(mr, x, jnp.where(mg, green_site(chr0), other))
    b = jnp.where(mb, x, jnp.where(mg, green_site(chr1), other))
    rgb = jnp.stack([r, g, b])

    bl = bayer_bilinear(cfa, pattern)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = ((yy >= BORDER) & (yy < h - BORDER)
             & (xx >= BORDER) & (xx < w - BORDER))
    return jnp.where(inner[None], rgb, bl)
