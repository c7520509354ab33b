"""EAHD demosaic (enhanced AHD with 3x3 Lab homogeneity voting).

Reference: ``rtengine/eahd_demosaic.cc``. Differences from plain AHD:
the homogeneity vote compares Lab distances over the full 3x3
neighborhood (9 positions, eahd_demosaic.cc:298-355); thresholds come
from fixed positions (left/right of the horizontal map, up/down of the
vertical, :361-363); each pixel's vote is spread over its 3x3
neighborhood (:367-392, expressed here as a box sum); and already-decided
neighbors "fixate" their winning direction when measuring distances
(:307-326).

The reference's row-sequential fixation (rows above the sweep line are
final) becomes a two-pass fixed point here: pass 1 votes without
fixation, pass 2 re-votes with the causal neighbors (row above + left)
fixated by the pass-1 decision — the same stencil the sweep applies,
evaluated in parallel (documented deviation).

R/B per direction follow interpolate_row_rb (eahd_demosaic.cc:95) and
the final R/B interpolate_row_rb_mul_pp (rawimagesource_i.h:61). Lab
uses the sRGB matrix rather than the camera matrix (deviation shared
with ahd.py — the metric only ranks directions).
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.ahd import _median3, _Shifter, _to_lab
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register

BORDER = 4

# 3x3 neighborhood in the reference's dmi order: rows i-1, i, i+1
_OFFS = [(-1, -1), (-1, 0), (-1, 1),
         (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1)]
_CAUSAL = {0, 1, 2, 3}  # positions whose direction is already decided


def _dir_rgb(x, g, mr, mg, mb, rg_row):
    """Directional R/B from one green candidate plane
    (interpolate_row_rb): same-site color kept, cross color from the 4
    diagonals, green-site colors by linear chroma interpolation."""
    sg = _Shifter(g, 1)
    sx = _Shifter(x, 1)
    cross = g + 0.25 * (sx(-1, -1) - sg(-1, -1) + sx(-1, 1) - sg(-1, 1)
                        + sx(1, -1) - sg(1, -1) + sx(1, 1) - sg(1, 1))
    horiz = g + 0.5 * (sx(0, -1) - sg(0, -1) + sx(0, 1) - sg(0, 1))
    vert = g + 0.5 * (sx(-1, 0) - sg(-1, 0) + sx(1, 0) - sg(1, 0))
    r = jnp.where(mr, x,
                  jnp.where(mb, cross, jnp.where(rg_row, horiz, vert)))
    b = jnp.where(mb, x,
                  jnp.where(mr, cross, jnp.where(rg_row, vert, horiz)))
    return jnp.clip(r, 0.0, 65535.0), jnp.clip(b, 0.0, 65535.0)


def _vote(labs, fix=None):
    """Homogeneity maps (hom_h, hom_v) from the two directional Lab
    stacks; ``fix`` (+1 horizontal, -1 vertical, 0 open) fixates the
    neighbor Lab the causal positions compare against."""
    (Lh, Ah, Bh), (Lv, Av, Bv) = labs
    sh = [_Shifter(p, 1) for p in (Lh, Ah, Bh)]
    sv = [_Shifter(p, 1) for p in (Lv, Av, Bv)]
    sfix = _Shifter(fix.astype(Lh.dtype), 1) if fix is not None else None

    dh = []  # per-position (dL, dA, dB) against the horizontal estimate
    dv = []
    for k, (dy, dx) in enumerate(_OFFS):
        nbh = [s(dy, dx) for s in sh]
        nbv = [s(dy, dx) for s in sv]
        if sfix is not None and k in _CAUSAL:
            # fixated: both maps measure against the winner's Lab
            f = sfix(dy, dx)
            nb_h = [jnp.where(f != 0, jnp.where(f > 0, h, v), h)
                    for h, v in zip(nbh, nbv)]
            nb_v = [jnp.where(f != 0, jnp.where(f > 0, h, v), v)
                    for h, v in zip(nbh, nbv)]
        else:
            nb_h, nb_v = nbh, nbv
        dh.append(tuple(jnp.abs(c - n) for c, n in zip((Lh, Ah, Bh),
                                                       nb_h)))
        dv.append(tuple(jnp.abs(c - n) for c, n in zip((Lv, Av, Bv),
                                                       nb_v)))

    # adaptive thresholds (:361-363): horizontal left/right vs vertical
    # up/down, per channel
    eL = jnp.minimum(jnp.maximum(dh[3][0], dh[5][0]),
                     jnp.maximum(dv[1][0], dv[7][0]))
    eA = jnp.minimum(jnp.maximum(dh[3][1], dh[5][1]),
                     jnp.maximum(dv[1][1], dv[7][1]))
    eB = jnp.minimum(jnp.maximum(dh[3][2], dh[5][2]),
                     jnp.maximum(dv[1][2], dv[7][2]))

    wh = sum(((d[0] <= eL) & (d[1] <= eA) & (d[2] <= eB)).astype(
        jnp.float32) for d in dh)
    wv = sum(((d[0] <= eL) & (d[1] <= eA) & (d[2] <= eB)).astype(
        jnp.float32) for d in dv)

    def box3(p):
        sp = _Shifter(p, 1)
        return sum(sp(dy, dx) for dy, dx in _OFFS)

    return box3(wh), box3(wv)


@register("eahd")
def eahd_demosaic(cfa, pattern, **kwargs):
    x = jnp.maximum(cfa, 0.0)
    h, w = x.shape
    mr, mg, mb = bayer_channel_masks(pattern, (h, w))
    rg_row = jnp.roll(mr, 1, axis=1) | jnp.roll(mr, -1, axis=1)
    s = _Shifter(x, 2)

    # green candidates (interpolate_row_g :49-87): 5-tap estimate
    # clipped to the neighbor range == median clamp
    gh = _median3(0.25 * ((s(0, -1) + s(0, 0) + s(0, 1)) * 2.0
                          - s(0, -2) - s(0, 2)), s(0, -1), s(0, 1))
    gv = _median3(0.25 * ((s(-1, 0) + s(0, 0) + s(1, 0)) * 2.0
                          - s(-2, 0) - s(2, 0)), s(-1, 0), s(1, 0))
    gh = jnp.where(mg, x, gh)
    gv = jnp.where(mg, x, gv)

    rh, bh = _dir_rgb(x, gh, mr, mg, mb, rg_row)
    rv, bv = _dir_rgb(x, gv, mr, mg, mb, rg_row)
    labs = [_to_lab(rh, gh, bh), _to_lab(rv, gv, bv)]

    hom_h, hom_v = _vote(labs)
    fix = jnp.sign(hom_h - hom_v)
    hom_h, hom_v = _vote(labs, fix=fix)

    g = jnp.where(mg, x,
                  jnp.where(hom_h > hom_v, gh,
                            jnp.where(hom_h < hom_v, gv,
                                      0.5 * (gh + gv))))
    g = jnp.maximum(g, 0.0)

    # final R/B from the decided green (interpolate_row_rb_mul_pp)
    sg = _Shifter(g, 1)
    sx = _Shifter(x, 1)
    diag = g + 0.25 * (sx(-1, -1) - sg(-1, -1) + sx(-1, 1) - sg(-1, 1)
                       + sx(1, -1) - sg(1, -1) + sx(1, 1) - sg(1, 1))
    horiz = g + 0.5 * (sx(0, -1) - sg(0, -1) + sx(0, 1) - sg(0, 1))
    vert = g + 0.5 * (sx(-1, 0) - sg(-1, 0) + sx(1, 0) - sg(1, 0))
    r = jnp.where(mr, x,
                  jnp.where(mb, diag, jnp.where(rg_row, horiz, vert)))
    b = jnp.where(mb, x,
                  jnp.where(mr, diag, jnp.where(rg_row, vert, horiz)))
    rgb = jnp.stack([jnp.maximum(r, 0.0), g, jnp.maximum(b, 0.0)])

    bl = bayer_bilinear(cfa, pattern)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = ((yy >= BORDER) & (yy < h - BORDER)
             & (xx >= BORDER) & (xx < w - BORDER))
    return jnp.where(inner[None], rgb, bl)
