"""IGV Bayer demosaic (reference: demosaic_algos.cc igv_interpolate:495).

Integrated Gaussian Vector demosaic:

1. Hamilton-Adams high-order green candidates N/E/W/S with gradient
   weights -> directional color-difference planes vdif (vertical fuse)
   and hdif (horizontal fuse) at non-green sites;
2. "integrated gaussian vector over variance" energies on the difference
   planes select between the H and V chrominance estimates, each limited
   by a 3-way median of its neighborhood;
3. green population G = C + chr;
4. chrominance spread: R@B / B@R from median-limited diagonal neighbors
   with inverse-gradient weights, then R@G / B@G from cardinal neighbors.

TPU formulation: the reference's interleaved half-image arrays (rgb[0/1],
vdif/hdif at half indices) become whole-plane shifted views — a half-index
offset of v1 is a full-plane offset of 2 rows — with parity masks doing
the site selection.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.registry import register

_EPS = 1e-5
_EPSSQ = 1e-5


def _med3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


@register("igv")
def igv_demosaic(cfa, pattern, **kw):
    """cfa (H, W) f32 in 0..65535; returns (3, H, W)."""
    x = jnp.maximum(cfa, 0.0) * (1.0 / 65535.0)
    mr, mg, mb = bayer_channel_masks(pattern, x.shape)
    h, w = x.shape
    r = 7
    p = jnp.pad(x, r, mode="reflect")

    def sh(dy, dx):
        return p[r + dy : r + dy + h, r + dx : r + dx + w]

    # --- stage 1: directional green-minus-color differences -------------
    def grad(d1, d3, c2):
        return _EPS + jnp.abs(sh(*d1) - sh(*d3)) + jnp.abs(x - sh(*c2))

    ng = grad((-1, 0), (-3, 0), (-2, 0))
    sg = grad((1, 0), (3, 0), (2, 0))
    wg = grad((0, -1), (0, -3), (0, -2))
    eg = grad((0, 1), (0, 3), (0, 2))

    def ha(g1, g3, g5, go, c2, c4):
        v = (23.0 * sh(*g1) + 23.0 * sh(*g3) + sh(*g5) + sh(*go)
             + 40.0 * x - 32.0 * sh(*c2) - 8.0 * sh(*c4)) / 48.0
        return jnp.clip(v, 0.0, 1.0)

    nv = ha((-1, 0), (-3, 0), (-5, 0), (1, 0), (-2, 0), (-4, 0))
    sv = ha((1, 0), (3, 0), (5, 0), (-1, 0), (2, 0), (4, 0))
    wv = ha((0, -1), (0, -3), (0, -5), (0, 1), (0, -2), (0, -4))
    ev = ha((0, 1), (0, 3), (0, 5), (0, -1), (0, 2), (0, 4))

    vdif = (sg * nv + ng * sv) / (ng + sg) - x
    hdif = (wg * ev + eg * wv) / (eg + wg) - x
    nong = ~mg
    vdif = jnp.where(nong, vdif, 0.0)
    hdif = jnp.where(nong, hdif, 0.0)

    pv = jnp.pad(vdif, r, mode="reflect")
    ph = jnp.pad(hdif, r, mode="reflect")

    def sv_(k):  # vertical shift of vdif by k full rows
        return pv[r + k : r + k + h, r : r + w]

    def sh_(k):  # horizontal shift of hdif by k full cols
        return ph[r : r + h, r + k : r + k + w]

    # --- stage 2: IGV energies + median-limited H/V chroma fuse ---------
    def energy(s):
        e = (_EPSSQ + 78.0 * s(0) ** 2
             + 69.0 * (s(-2) ** 2 + s(2) ** 2)
             + 51.0 * (s(-4) ** 2 + s(4) ** 2)
             + 21.0 * (s(-6) ** 2 + s(6) ** 2)
             - 6.0 * (s(-2) + s(0) + s(2)) ** 2
             - 10.0 * ((s(-4) + s(-2) + s(0)) ** 2
                       + (s(0) + s(2) + s(4)) ** 2)
             - 7.0 * ((s(-6) + s(-4) + s(-2)) ** 2
                      + (s(2) + s(4) + s(6)) ** 2))
        return jnp.clip(e, 0.0, 1.0)

    e_v = energy(sv_)
    e_h = energy(sh_)
    lim_v = _med3(0.725 * sv_(0) + 0.1375 * (sv_(-2) + sv_(2)),
                  sv_(-2), sv_(2))
    lim_h = _med3(0.725 * sh_(0) + 0.1375 * (sh_(-2) + sh_(2)),
                  sh_(-2), sh_(2))
    chr_site = (e_h * lim_v + e_v * lim_h) / (e_v + e_h)

    g = jnp.where(mg, x, x + chr_site)

    chr_r = jnp.where(mr, chr_site, 0.0)
    chr_b = jnp.where(mb, chr_site, 0.0)

    # --- stage 3: chroma at the opposite color site (diagonals) ---------
    def spread_diag(chn):
        pc = jnp.pad(chn, r, mode="reflect")

        def s(dy, dx):
            return pc[r + dy : r + dy + h, r + dx : r + dx + w]

        num = jnp.zeros_like(x)
        den = jnp.zeros_like(x)
        for oy, ox in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            wgt = 1.0 / (_EPS + jnp.abs(s(oy, ox) - s(3 * oy, 3 * ox))
                         + jnp.abs(s(-oy, -ox) - s(3 * oy, 3 * ox)))
            limited = _med3(s(oy, ox), s(3 * oy, ox), s(oy, 3 * ox))
            num = num + wgt * limited
            den = den + wgt
        return num / den

    chr_r = jnp.where(mb, spread_diag(chr_r), chr_r)
    chr_b = jnp.where(mr, spread_diag(chr_b), chr_b)

    # --- stage 4: chroma at green sites (cardinals) ----------------------
    def spread_card(chn):
        pc = jnp.pad(chn, r, mode="reflect")

        def s(dy, dx):
            return pc[r + dy : r + dy + h, r + dx : r + dx + w]

        num = jnp.zeros_like(x)
        den = jnp.zeros_like(x)
        for oy, ox in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            wgt = 1.0 / (_EPS + jnp.abs(s(oy, ox) - s(3 * oy, 3 * ox))
                         + jnp.abs(s(-oy, -ox) - s(3 * oy, 3 * ox)))
            num = num + wgt * s(oy, ox)
            den = den + wgt
        return num / den

    chr_r = jnp.where(mg, spread_card(chr_r), chr_r)
    chr_b = jnp.where(mg, spread_card(chr_b), chr_b)

    red = jnp.where(mr, x, g - chr_r)
    blue = jnp.where(mb, x, g - chr_b)
    return jnp.stack([red, g, blue]) * 65535.0
