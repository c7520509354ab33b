"""Green equilibration (reference: rtengine/green_equil_RT.cc).

Global: scale each G row-coset so both G averages match. Local: at green
sites, compare diagonal (opposite-coset) vs in-coset neighbor coherence;
when the G1/G2 imbalance dominates texture, replace G with the mean of the
measured and diagonally-interpolated value (gradient-weighted, Hamilton-
Adams style along the 4 diagonals).

Whole-plane: the reference's half-grid cfa[.][c>>1] addressing is just the
G quincunx — offsets double back to full-plane shifts.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(x, dy, dx, r=3):
    p = jnp.pad(x, r, mode="reflect")
    h, w = x.shape
    return p[r + dy : r + dy + h, r + dx : r + dx + w]


def green_equilibrate_global(cfa, mg):
    """Global G1/G2 balance (green_equil_RT.cc:38-90)."""
    h, w = cfa.shape
    row_is_odd = (jnp.arange(h) % 2 == 1)[:, None]
    g1_mask = mg & ~row_is_odd
    g2_mask = mg & row_is_odd
    avg1 = jnp.sum(jnp.where(g1_mask, cfa, 0.0)) / jnp.maximum(
        jnp.sum(g1_mask), 1)
    avg2 = jnp.sum(jnp.where(g2_mask, cfa, 0.0)) / jnp.maximum(
        jnp.sum(g2_mask), 1)
    avg1 = jnp.maximum(avg1, 1e-6)
    avg2 = jnp.maximum(avg2, 1e-6)
    corr1 = (avg1 + avg2) / 2.0 / avg1
    corr2 = (avg1 + avg2) / 2.0 / avg2
    corr = jnp.where(row_is_odd, corr2, corr1)
    return jnp.where(mg, cfa * corr, cfa)


def green_equilibrate(cfa, mg, thresh):
    """Local equilibration (green_equil_RT.cc:120-220). `thresh` is the
    user GreenEqThreshold / 100 (RAWParams), constant across the plane."""
    eps = 1.0
    x = cfa
    # diagonal (opposite G coset) neighbors
    o1_1 = _shift(x, -1, -1)
    o1_2 = _shift(x, -1, 1)
    o1_3 = _shift(x, 1, -1)
    o1_4 = _shift(x, 1, 1)
    # same-coset neighbors
    o2_1 = _shift(x, -2, 0)
    o2_2 = _shift(x, 2, 0)
    o2_3 = _shift(x, 0, -2)
    o2_4 = _shift(x, 0, 2)

    d1 = o1_1 + o1_2 + o1_3 + o1_4
    d2 = o2_1 + o2_2 + o2_3 + o2_4
    c1 = (jnp.abs(o1_1 - o1_2) + jnp.abs(o1_1 - o1_3) + jnp.abs(o1_1 - o1_4)
          + jnp.abs(o1_2 - o1_3) + jnp.abs(o1_3 - o1_4)
          + jnp.abs(o1_2 - o1_4))
    c2 = (jnp.abs(o2_1 - o2_2) + jnp.abs(o2_1 - o2_3) + jnp.abs(o2_1 - o2_4)
          + jnp.abs(o2_2 - o2_3) + jnp.abs(o2_3 - o2_4)
          + jnp.abs(o2_2 - o2_4))
    cond = (c1 + c2) < 6.0 * thresh * jnp.abs(d1 - d2)

    gin = x
    gmp2p2 = gin - _shift(x, 2, 2)
    gmm2m2 = gin - _shift(x, -2, -2)
    gmm2p2 = gin - _shift(x, -2, 2)
    gmp2m2 = gin - _shift(x, 2, -2)

    gse = o1_4 + 0.5 * gmp2p2
    gnw = o1_1 + 0.5 * gmm2m2
    gne = o1_2 + 0.5 * gmm2p2
    gsw = o1_3 + 0.5 * gmp2m2

    wtse = 1.0 / (eps + gmp2p2 ** 2 + (_shift(x, 3, 3) - o1_4) ** 2)
    wtnw = 1.0 / (eps + gmm2m2 ** 2 + (_shift(x, -3, -3) - o1_1) ** 2)
    wtne = 1.0 / (eps + gmm2p2 ** 2 + (_shift(x, -3, 3) - o1_2) ** 2)
    wtsw = 1.0 / (eps + gmp2m2 ** 2 + (_shift(x, 3, -3) - o1_3) ** 2)

    ginterp = (gse * wtse + gnw * wtnw + gne * wtne + gsw * wtsw) / (
        wtse + wtnw + wtne + wtsw)
    replace = (ginterp - gin) < thresh * (ginterp + gin)
    val = jnp.where(cond & replace, 0.5 * (ginterp + gin), gin)
    return jnp.where(mg, val, cfa)
