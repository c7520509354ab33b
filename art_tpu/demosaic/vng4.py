"""VNG4 Bayer demosaic (reference: vng4_demosaic_RT.cc; Chang & Tan VNG).

Variable Number of Gradients: per pixel, compute 8 directional gradients
from same-color pixel pairs in the 5x5 neighborhood, keep the directions
whose gradient falls below T = 1.5*min + 0.5*(max - min), and correct the
center value with the mean color difference observed at the selected
neighbors.

TPU formulation (whole-plane, documented deviation from the reference's
code-table walk): the gradient stencils are the uniform Chang-Tan sums,
which pair only even-offset (same-CFA-color) taps, so one formula serves
all four site parities. The per-direction color estimates come from a
bilinear prior B_c shifted to the neighbor position; the VNG update is

    out_c = v + sum_d w_d (B_c(p+d) - B_c0(p+d)) / sum_d w_d

with w_d the below-threshold indicator and c0 the center's CFA color.
For c == c0 this reduces to the mosaic value exactly. This preserves
VNG's color-difference-constancy-along-edges behavior while mapping to
dense VPU arithmetic instead of data-dependent branches.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.bilinear import bayer_bilinear
from art_tpu.demosaic.registry import register


def _shifter(x, r):
    p = jnp.pad(x, r, mode="reflect")
    h, w = x.shape

    def sh(dy, dx):
        return p[r + dy : r + dy + h, r + dx : r + dx + w]

    return sh


def _gradients(sh):
    """8 directional gradients; every |a-b| pairs same-color sites."""
    a = jnp.abs

    def card(f):
        # f maps (dy, dx) in the north frame -> actual offset
        return (a(sh(*f(-1, 0)) - sh(*f(1, 0)))
                + a(sh(*f(-2, 0)) - sh(*f(0, 0)))
                + 0.5 * (a(sh(*f(-1, -1)) - sh(*f(1, -1)))
                         + a(sh(*f(-1, 1)) - sh(*f(1, 1)))
                         + a(sh(*f(-2, -1)) - sh(*f(0, -1)))
                         + a(sh(*f(-2, 1)) - sh(*f(0, 1)))))

    def diag(f):
        return (a(sh(*f(-1, 1)) - sh(*f(1, -1)))
                + a(sh(*f(-2, 2)) - sh(*f(0, 0)))
                + 0.5 * (a(sh(*f(-2, 1)) - sh(*f(0, -1)))
                         + a(sh(*f(-1, 2)) - sh(*f(1, 0)))))

    g_n = card(lambda dy, dx: (dy, dx))
    g_s = card(lambda dy, dx: (-dy, dx))
    g_e = card(lambda dy, dx: (dx, -dy))
    g_w = card(lambda dy, dx: (-dx, dy))
    g_ne = diag(lambda dy, dx: (dy, dx))
    g_sw = diag(lambda dy, dx: (-dy, -dx))
    g_nw = diag(lambda dy, dx: (dy, -dx))
    g_se = diag(lambda dy, dx: (-dy, dx))
    dirs = [(-1, 0), (1, 0), (0, 1), (0, -1),
            (-1, 1), (1, -1), (-1, -1), (1, 1)]
    return dirs, [g_n, g_s, g_e, g_w, g_ne, g_sw, g_nw, g_se]


@register("vng4")
def vng4_demosaic(cfa, pattern, **kw):
    """cfa (H, W) f32 in 0..65535; returns (3, H, W)."""
    x = cfa
    mr, mg, mb = bayer_channel_masks(pattern, x.shape)
    sh = _shifter(x, 2)
    dirs, grads = _gradients(sh)

    gmin = grads[0]
    gmax = grads[0]
    for g in grads[1:]:
        gmin = jnp.minimum(gmin, g)
        gmax = jnp.maximum(gmax, g)
    thold = 1.5 * gmin + 0.5 * (gmax - gmin)

    prior = bayer_bilinear(x, pattern)  # (3, H, W)
    shb = [_shifter(prior[c], 1) for c in range(3)]

    n = jnp.zeros_like(x)
    acc = [jnp.zeros_like(x) for _ in range(3)]
    for (dy, dx), g in zip(dirs, grads):
        w = (g <= thold).astype(x.dtype)
        n = n + w
        bc = [shb[c](dy, dx) for c in range(3)]
        # bilinear estimate of the CENTER's color at the neighbor site:
        # select by the center's CFA mask after shifting
        ref = jnp.where(mr, bc[0], jnp.where(mg, bc[1], bc[2]))
        for c in range(3):
            acc[c] = acc[c] + w * (bc[c] - ref)

    inv = 1.0 / jnp.maximum(n, 1.0)
    out = [x + acc[c] * inv for c in range(3)]
    out = [jnp.where(m, x, o) for m, o in
           zip((mr, mg, mb), out)]
    return jnp.stack(out)
