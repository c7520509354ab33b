"""AHD demosaic (Hirakawa-Parks adaptive homogeneity-directed).

Reference: ``rtengine/ahd_demosaic_RT.cc`` (144px tiles under OpenMP).
Whole-plane JAX formulation: horizontal/vertical green candidates with
median clamping, per-direction R/B from color differences, CIELab
homogeneity maps (adaptive epsilon from opposing-direction differences),
3x3-summed homogeneity vote. The reference folds the camera matrix into
the Lab conversion; here sRGB->XYZ is used directly (the metric only
ranks directions — documented deviation). Border (5px) falls back to
bilinear, matching border_interpolate2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register

BORDER = 5

_XYZ_RGB = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]])
_D65 = np.array([0.950456, 1.0, 1.088754])
_XYZ_N = _XYZ_RGB / _D65[:, None]


class _Shifter:
    def __init__(self, x, r=2):
        self.r = r
        self.h, self.w = x.shape
        self.p = jnp.pad(x, r, mode="reflect")

    def __call__(self, dy, dx):
        r = self.r
        return self.p[r + dy : r + dy + self.h, r + dx : r + dx + self.w]


def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(jnp.maximum(a, b), c),
                       jnp.minimum(a, b))


def _lab_f(t):
    # the reference's cbrt LUT: t in 0..1 domain
    return jnp.where(t > 0.008856, jnp.cbrt(jnp.maximum(t, 1e-9)),
                     7.787 * t + 16.0 / 116.0)


def _to_lab(r, g, b):
    scale = 1.0 / 65535.0
    x = (_XYZ_N[0, 0] * r + _XYZ_N[0, 1] * g + _XYZ_N[0, 2] * b) * scale
    y = (_XYZ_N[1, 0] * r + _XYZ_N[1, 1] * g + _XYZ_N[1, 2] * b) * scale
    z = (_XYZ_N[2, 0] * r + _XYZ_N[2, 1] * g + _XYZ_N[2, 2] * b) * scale
    fx, fy, fz = _lab_f(x), _lab_f(y), _lab_f(z)
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


@register("ahd")
def ahd_demosaic(cfa, pattern, **kwargs):
    x = jnp.maximum(cfa, 0.0)
    h, w = x.shape
    mr, mg, mb = bayer_channel_masks(pattern, (h, w))
    s = _Shifter(x, 2)

    # green candidates at R/B sites (median-clamped, :96-102)
    gh = _median3(0.25 * ((s(0, -1) + s(0, 0) + s(0, 1)) * 2.0
                          - s(0, -2) - s(0, 2)), s(0, -1), s(0, 1))
    gv = _median3(0.25 * ((s(-1, 0) + s(0, 0) + s(1, 0)) * 2.0
                          - s(-2, 0) - s(2, 0)), s(-1, 0), s(1, 0))
    g_dir = [jnp.where(mg, x, gh), jnp.where(mg, x, gv)]

    # G-site neighbor colors: rows where R is horizontally adjacent
    rg_row = jnp.roll(mr, 1, axis=1) | jnp.roll(mr, -1, axis=1)

    rgbs = []
    labs = []
    for g in g_dir:
        sg = _Shifter(g, 1)

        def axh(p, sp=None):
            sp = sp or _Shifter(p, 1)
            return sp(0, -1) + sp(0, 1)

        sh_x = _Shifter(x, 1)
        # at G sites: horizontal-neighbor color from +-1 cols, the other
        # from +-1 rows (:113-118)
        c_h = jnp.clip(x + 0.5 * (sh_x(0, -1) + sh_x(0, 1)
                                  - sg(0, -1) - sg(0, 1)), 0.0, 65535.0)
        c_v = jnp.clip(x + 0.5 * (sh_x(-1, 0) + sh_x(1, 0)
                                  - sg(-1, 0) - sg(1, 0)), 0.0, 65535.0)
        # at opposite sites: diagonal color differences (:120-124)
        diag = jnp.clip(g + 0.25 * (
            sh_x(-1, -1) + sh_x(-1, 1) + sh_x(1, -1) + sh_x(1, 1)
            - sg(-1, -1) - sg(-1, 1) - sg(1, -1) - sg(1, 1)), 0.0, 65535.0)

        r = jnp.where(mr, x,
                      jnp.where(mb, diag,
                                jnp.where(rg_row, c_h, c_v)))
        b = jnp.where(mb, x,
                      jnp.where(mr, diag,
                                jnp.where(rg_row, c_v, c_h)))
        rgbs.append((r, g, b))
        labs.append(_to_lab(r, g, b))

    # homogeneity maps (:146-173): dirs left/right (0,1) and up/down (2,3)
    dirs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
    ldiff = [[None] * 4 for _ in range(2)]
    abdiff = [[None] * 4 for _ in range(2)]
    for d in range(2):
        L, A, B = labs[d]
        sl, sa, sb = _Shifter(L, 1), _Shifter(A, 1), _Shifter(B, 1)
        for i, (dy, dx) in enumerate(dirs):
            ldiff[d][i] = jnp.abs(L - sl(dy, dx))
            abdiff[d][i] = ((A - sa(dy, dx)) ** 2 + (B - sb(dy, dx)) ** 2)
    leps = jnp.minimum(jnp.maximum(ldiff[0][0], ldiff[0][1]),
                       jnp.maximum(ldiff[1][2], ldiff[1][3]))
    abeps = jnp.minimum(jnp.maximum(abdiff[0][0], abdiff[0][1]),
                        jnp.maximum(abdiff[1][2], abdiff[1][3]))
    homo = []
    for d in range(2):
        hsum = jnp.zeros_like(x)
        for i in range(4):
            hsum = hsum + ((ldiff[d][i] <= leps)
                           & (abdiff[d][i] <= abeps)).astype(x.dtype)
        homo.append(hsum)

    def box3(p):
        sp = _Shifter(p, 1)
        return (sp(-1, -1) + sp(-1, 0) + sp(-1, 1) + sp(0, -1) + sp(0, 0)
                + sp(0, 1) + sp(1, -1) + sp(1, 0) + sp(1, 1))

    hm0 = box3(homo[0])
    hm1 = box3(homo[1])

    out = []
    for c in range(3):
        p0 = rgbs[0][c]
        p1 = rgbs[1][c]
        out.append(jnp.where(hm1 > hm0, p1,
                             jnp.where(hm0 > hm1, p0, 0.5 * (p0 + p1))))
    rgb = jnp.stack(out)

    bl = bayer_bilinear(cfa, pattern)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = ((yy >= BORDER) & (yy < h - BORDER)
             & (xx >= BORDER) & (xx < w - BORDER))
    return jnp.where(inner[None], rgb, bl)
