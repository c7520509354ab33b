"""Hot/dead pixel detection + CFA-aware interpolation.

Reference: ``rtengine/badpixels.cc`` — findHotDeadPixels:477 (median-based
deviation vs 5x5 deviation energy) and interpolateBadPixelsBayer:66
(direction-weighted pair averaging that skips bad partners).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(x, dy, dx, r=3):
    p = jnp.pad(x, r, mode="reflect")
    h, w = x.shape
    return p[r + dy : r + dy + h, r + dx : r + dx + w]


def find_hot_dead(cfa, thresh, find_hot=True, find_dead=True,
                  is_xtrans=False):
    """Boolean bad-pixel mask (findHotDeadPixels semantics)."""
    varthresh = (20.0 * (thresh / 100.0) + 1.0) / 24.0
    if is_xtrans:
        varthresh *= 0.25
    # median of the 9 same-color samples on the step-2 5x5 grid
    neigh = jnp.stack([
        _shift(cfa, dy, dx)
        for dy in (-2, 0, 2) for dx in (-2, 0, 2)
    ])
    med = jnp.median(neigh, axis=0)
    dev = cfa - med
    absdev = jnp.abs(dev)
    # 5x5 sum of |dev| minus the center
    p = jnp.pad(absdev, 2, mode="constant")
    h, w = cfa.shape
    nb = jnp.zeros_like(cfa)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nb = nb + p[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]
    hfnbrave = nb - 2.0 * absdev  # reference starts at -pixdev then adds all
    bad = absdev > varthresh * hfnbrave
    if not find_dead:
        bad = bad & (dev > 0)
    if not find_hot:
        bad = bad & (dev < 0)
    return bad


def interpolate_bad_bayer(cfa, bad, mg):
    """interpolateBadPixelsBayer: gradient-weighted pair averages."""
    eps = 1.0
    badf = bad.astype(cfa.dtype)
    good = 1.0 - badf

    wtdsum = jnp.zeros_like(cfa)
    norm = jnp.zeros_like(cfa)

    def add_pair(dy, dx, weight):
        a = _shift(cfa, dy, dx)
        b = _shift(cfa, -dy, -dx)
        ok = _shift(good, dy, dx) * _shift(good, -dy, -dx)
        w = ok * weight / (jnp.abs(a - b) + eps)
        return w * (a + b), w

    # green diagonals (only meaningful at G sites)
    sg, ng = jnp.zeros_like(cfa), jnp.zeros_like(cfa)
    for dy, dx in ((-1, 1), (-1, -1)):
        s, n = add_pair(dy, dx, 0.70710678)
        sg, ng = sg + s, ng + n
    # R/B far diagonals
    sc, nc = jnp.zeros_like(cfa), jnp.zeros_like(cfa)
    for dy, dx in ((-2, 2), (-2, -2)):
        s, n = add_pair(dy, dx, 0.35355339)
        sc, nc = sc + s, nc + n
    wtdsum = jnp.where(mg, sg, sc)
    norm = jnp.where(mg, ng, nc)
    # channel-independent H/V pairs
    for dy, dx in ((0, 2), (2, 0)):
        s, n = add_pair(dy, dx, 0.5)
        wtdsum, norm = wtdsum + s, norm + n

    interp = wtdsum / (2.0 * jnp.maximum(norm, 1e-12))
    # fallback: plain average of non-bad step-2 neighbors
    fsum = jnp.zeros_like(cfa)
    fcnt = jnp.zeros_like(cfa)
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            if dy == 0 and dx == 0:
                continue
            ok = _shift(good, dy, dx)
            fsum = fsum + ok * _shift(cfa, dy, dx)
            fcnt = fcnt + ok
    fallback = fsum / jnp.maximum(fcnt, 1.0)
    fixed = jnp.where(norm > 0, interp, fallback)
    return jnp.where(bad, fixed, cfa)
