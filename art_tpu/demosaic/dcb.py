"""DCB demosaic — TPU whole-plane formulation.

Reference: ``rtengine/demosaic_algos.cc`` dcb_demosaic (:1666) and its step
functions dcb_hid/:1345, dcb_hid2/:1403, dcb_map/:1434, dcb_correction/
:1457, dcb_color/:1361, dcb_pp/:1480, dcb_correction2/:1537,
dcb_refinement/:1577, dcb_color_full/:1620 (Jacek Gozdz's DCB). The
reference runs 194x194 cached tiles under OpenMP; here every step is a
full-plane shifted-stencil expression with CFA parity masks — XLA fuses
each step's chain, no tile/halo management needed. Borders (6 px) fall
back to the bilinear result (fill_border equivalent).

Step sequence mirrors dcb_demosaic :1736-1766: hid, iterations x
(3x hid2, map, correction), color, pp, map, correction2, map, correction,
color, 2x (map, correction), map, restore R/B, then color or
(refinement + color_full) depending on dcb_enhance.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register

BORDER = 6


class _Shifter:
    def __init__(self, x, r=4):
        self.r = r
        self.h, self.w = x.shape
        self.p = jnp.pad(x, r, mode="reflect")

    def __call__(self, dy, dx):
        r = self.r
        return self.p[r + dy : r + dy + self.h, r + dx : r + dx + self.w]


def _sh(x, dy, dx, r=4):
    return _Shifter(x, r)(dy, dx)


def _map_weight(mp):
    """The 0..16 'current' weight: 4*map + 2*(4-neighborhood) + axial +-2
    (dcb_correction :1467)."""
    m = _Shifter(mp, 2)
    return (4.0 * m(0, 0)
            + 2.0 * (m(-1, 0) + m(1, 0) + m(0, -1) + m(0, 1))
            + m(-2, 0) + m(2, 0) + m(0, -2) + m(0, 2))


def _dcb_map(g):
    """Direction map on the green plane (1 = vertical), dcb_map :1444-1452
    (u there is 3 rows; pix[+-3] is 3 columns)."""
    s = _Shifter(g, 3)
    gh0, gh1 = s(0, -3), s(0, 3)
    gv0, gv1 = s(-3, 0), s(3, 0)
    cond = 4.0 * s(0, 0) > (gh0 + gh1 + gv0 + gv1)
    m_hi = (jnp.minimum(gh0, gh1) + gh0 + gh1) < (jnp.minimum(gv0, gv1)
                                                  + gv0 + gv1)
    m_lo = (jnp.maximum(gh0, gh1) + gh0 + gh1) > (jnp.maximum(gv0, gv1)
                                                  + gv0 + gv1)
    return jnp.where(cond, m_hi, m_lo).astype(g.dtype)


@register("dcb")
def dcb_demosaic(cfa, pattern, iterations=2, enhance=True, **kwargs):
    x = jnp.maximum(cfa, 0.0)
    h, w = x.shape
    mr, mg, mb = bayer_channel_masks(pattern, (h, w))
    mrb = ~mg

    # planes: CFA values at their native sites, 0 elsewhere
    r0 = jnp.where(mr, x, 0.0)
    b0 = jnp.where(mb, x, 0.0)
    g = jnp.where(mg, x, 0.0)
    # site color plane (R or B value at RB sites) = the mosaic itself
    c_site = x

    # dcb_hid: bilinear green at RB sites
    sg = _Shifter(g, 1)
    g = jnp.where(mrb,
                  0.25 * (sg(0, -1) + sg(0, 1) + sg(-1, 0) + sg(1, 0)), g)

    def hid2(g):
        # dcb_hid2 :1423: G = C + mean4(G+-2 - C+-2) at RB sites
        s = _Shifter(g, 2)
        sc = _Shifter(c_site, 2)
        est = c_site + 0.25 * (
            s(-2, 0) + s(2, 0) + s(0, -2) + s(0, 2)
            - sc(-2, 0) - sc(2, 0) - sc(0, -2) - sc(0, 2))
        return jnp.where(mrb, est, g)

    def correction(g, mp):
        cur = _map_weight(mp)
        s = _Shifter(g, 1)
        est = ((16.0 - cur) * (s(0, -1) + s(0, 1))
               + cur * (s(-1, 0) + s(1, 0))) * 0.03125
        return jnp.where(mrb, est, g)

    def correction2(g, mp):
        cur = _map_weight(mp)
        s = _Shifter(g, 1)
        sc = _Shifter(c_site, 2)
        est = c_site + ((16.0 - cur) * (s(0, -1) + s(0, 1)
                                        - (sc(0, -2) + sc(0, 2)))
                        + cur * (s(-1, 0) + s(1, 0)
                                 - (sc(-2, 0) + sc(2, 0)))) * 0.03125
        return jnp.where(mrb, est, g)

    def color(g, r, b):
        # dcb_color :1361: R at B (and B at R) via diagonal diffs; R/B at
        # G via axial diffs
        def diag(p):
            s = _Shifter(p, 1)
            return s(-1, -1) + s(-1, 1) + s(1, -1) + s(1, 1)

        def axh(p):
            s = _Shifter(p, 1)
            return s(0, -1) + s(0, 1)

        def axv(p):
            s = _Shifter(p, 1)
            return s(-1, 0) + s(1, 0)

        gd = diag(g)
        r_at_b = g + 0.25 * (diag(r) - gd)
        b_at_r = g + 0.25 * (diag(b) - gd)
        r = jnp.where(mb, r_at_b, r)
        b = jnp.where(mr, b_at_r, b)
        # at G sites: horizontal neighbors are one RB color, vertical the
        # other — take whichever has mass (masked planes are 0 off-site)
        ghh = axh(g)
        gvv = axv(g)
        r_h = g + 0.5 * (axh(r) - ghh)
        r_v = g + 0.5 * (axv(r) - gvv)
        b_h = g + 0.5 * (axh(b) - ghh)
        b_v = g + 0.5 * (axv(b) - gvv)
        # row parity decides: on a G site in an RG row, R is horizontal
        rg_row = jnp.roll(mr, 1, axis=1) | jnp.roll(mr, -1, axis=1)
        r = jnp.where(mg, jnp.where(rg_row, r_h, r_v), r)
        b = jnp.where(mg, jnp.where(rg_row, b_v, b_h), b)
        return r, b

    def pp(g, r, b):
        # dcb_pp :1480: 8-neighbor means; R/B re-centered on local green
        def mean8(p):
            s = _Shifter(p, 1)
            return 0.125 * (s(-1, -1) + s(-1, 0) + s(-1, 1) + s(0, -1)
                            + s(0, 1) + s(1, -1) + s(1, 0) + s(1, 1))

        r1 = mean8(r)
        g1 = mean8(g)
        b1 = mean8(b)
        return r1 + (g - g1), b1 + (g - g1)

    # --- main sequence (dcb_demosaic :1736) ---
    for _ in range(max(int(iterations), 1)):
        g = hid2(g)
        g = hid2(g)
        g = hid2(g)
        g = correction(g, _dcb_map(g))

    r, b = color(g, r0, b0)
    r, b = pp(g, r, b)
    g = correction2(g, _dcb_map(g))
    g = correction(g, _dcb_map(g))
    r, b = color(g, r, b)
    g = correction(g, _dcb_map(g))
    g = correction(g, _dcb_map(g))
    mp = _dcb_map(g)
    # restore_from_buffer: R/B back to native CFA values
    r = jnp.where(mr, x, r)
    b = jnp.where(mb, x, b)

    if not enhance:
        r, b = color(g, jnp.where(mr, r, 0.0), jnp.where(mb, b, 0.0))
    else:
        # dcb_refinement :1577 (green at RB sites, ratio-based, clamped)
        cur = _map_weight(mp)
        s = _Shifter(g, 1)
        sc = _Shifter(c_site, 2)
        cp = c_site
        f0 = (s(-1, 0) + s(1, 0)) / (1.0 + 2.0 * cp)
        f1 = 2.0 * s(-1, 0) / (1.0 + sc(-2, 0) + cp)
        f2 = 2.0 * s(1, 0) / (1.0 + sc(2, 0) + cp)
        g1 = f0 + f1 + f2
        h0 = (s(0, -1) + s(0, 1)) / (1.0 + 2.0 * cp)
        h1 = 2.0 * s(0, -1) / (1.0 + sc(0, -2) + cp)
        h2 = 2.0 * s(0, 1) / (1.0 + sc(0, 2) + cp)
        g2 = h0 + h1 + h2
        est = cp * (cur * g1 + (16.0 - cur) * g2) / 48.0
        lo = jnp.minimum(jnp.minimum(s(0, -1), s(0, 1)),
                         jnp.minimum(s(-1, 0), s(1, 0)))
        hi = jnp.maximum(jnp.maximum(s(0, -1), s(0, 1)),
                         jnp.maximum(s(-1, 0), s(1, 0)))
        g = jnp.where(mrb, jnp.clip(est, lo, hi), g)

        # dcb_color_full :1620: adaptive chroma interpolation
        ch_r = jnp.where(mr, r - g, 0.0)  # R-G at R sites
        ch_b = jnp.where(mb, b - g, 0.0)  # B-G at B sites

        def chroma_diag(ch):
            s = _Shifter(ch, 4)

            def w_(a, bb, cc):
                return 1.0 / (1.0 + jnp.abs(a - bb) + jnp.abs(a - cc)
                              + jnp.abs(bb - cc))

            c_mm, c_mp = s(-1, -1), s(-1, 1)
            c_pm, c_pp_ = s(1, -1), s(1, 1)
            f0 = w_(c_mm, c_pp_, s(-3, -3))
            f1 = w_(c_mp, c_pm, s(-3, 3))
            f2 = w_(c_pm, c_mp, s(3, -3))
            f3 = w_(c_pp_, c_mm, s(3, 3))
            g0 = 1.325 * c_mm - 0.175 * s(-3, -3) - 0.075 * (s(-3, -1)
                                                             + s(-1, -3))
            g1 = 1.325 * c_mp - 0.175 * s(-3, 3) - 0.075 * (s(-3, 1)
                                                            + s(-1, 3))
            g2 = 1.325 * c_pm - 0.175 * s(3, -3) - 0.075 * (s(3, -1)
                                                            + s(1, -3))
            g3 = 1.325 * c_pp_ - 0.175 * s(3, 3) - 0.075 * (s(3, 1)
                                                            + s(1, 3))
            return (f0 * g0 + f1 * g1 + f2 * g2 + f3 * g3) / (f0 + f1
                                                              + f2 + f3)

        # opposite RB sites get the diagonal estimate
        ch_r = jnp.where(mb, chroma_diag(ch_r), ch_r)
        ch_b = jnp.where(mr, chroma_diag(ch_b), ch_b)

        def chroma_axial(ch):
            s = _Shifter(ch, 3)

            def w_(a, bb, cc):
                return 1.0 / (1.0 + jnp.abs(a - bb) + jnp.abs(a - cc)
                              + jnp.abs(bb - cc))

            f0 = w_(s(-1, 0), s(1, 0), s(-3, 0))
            f1 = w_(s(0, 1), s(0, -1), s(0, 3))
            f2 = w_(s(0, -1), s(0, 1), s(0, -3))
            f3 = w_(s(1, 0), s(-1, 0), s(3, 0))
            g0 = 0.875 * s(-1, 0) + 0.125 * s(-3, 0)
            g1 = 0.875 * s(0, 1) + 0.125 * s(0, 3)
            g2 = 0.875 * s(0, -1) + 0.125 * s(0, -3)
            g3 = 0.875 * s(1, 0) + 0.125 * s(3, 0)
            return (f0 * g0 + f1 * g1 + f2 * g2 + f3 * g3) / (f0 + f1
                                                              + f2 + f3)

        ch_r = jnp.where(mg, chroma_axial(ch_r), ch_r)
        ch_b = jnp.where(mg, chroma_axial(ch_b), ch_b)
        r = ch_r + g
        b = ch_b + g

    out = jnp.stack([r, g, b])
    out = jnp.clip(out, 0.0, 65535.0)

    # border fallback
    bl = bayer_bilinear(cfa, pattern)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = ((yy >= BORDER) & (yy < h - BORDER)
             & (xx >= BORDER) & (xx < w - BORDER))
    return jnp.where(inner[None], out, bl)
