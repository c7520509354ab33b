"""X-Trans demosaic (reference: rtengine/xtrans_demosaic.cc).

`fast_xtrans` (fast_xtrans_interpolate:971): 3x3 weighted color sums with
green normalization depending on solitary/paired green sites — whole-plane
with host-precomputed 6x6 site-type masks.

The Markesteijn 1/3-pass methods currently route here (quality parity work
tracked for a later round); dispatch accepts all reference method strings.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.core.image import xtrans_color_index

_W33 = ((0.25, 0.5, 0.25), (0.5, 0.0, 0.5), (0.25, 0.5, 0.25))


def _shift(x, dy, dx):
    p = jnp.pad(x, 1, mode="reflect")
    h, w = x.shape
    return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def fast_xtrans(cfa, xtrans_pattern):
    h, w = cfa.shape
    cidx = xtrans_color_index(xtrans_pattern, (h, w))
    masks = [jnp.asarray(cidx == c) for c in range(3)]

    sums = []
    for c in range(3):
        mc = jnp.where(masks[c], cfa, 0.0)
        s = jnp.zeros_like(cfa)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                wgt = _W33[dy + 1][dx + 1]
                if wgt:
                    s = s + _shift(mc, dy, dx) * wgt
        sums.append(s)

    # solitary green: left and right neighbors share a color (host masks)
    pat = np.asarray(xtrans_pattern, dtype=np.int64).reshape(6, 6)
    ci = np.take(pat, np.arange(w)[None, :] % 6
                 + 6 * (np.arange(h)[:, None] % 6))
    left = np.take(pat, (np.arange(w)[None, :] - 1) % 6
                   + 6 * (np.arange(h)[:, None] % 6))
    right = np.take(pat, (np.arange(w)[None, :] + 1) % 6
                    + 6 * (np.arange(h)[:, None] % 6))
    solitary = jnp.asarray((ci == 1) & (left == right))

    r = jnp.where(masks[0], cfa,
                  jnp.where(masks[1],
                            jnp.where(solitary, sums[0],
                                      sums[0] * 1.3333333),
                            sums[0]))
    g = jnp.where(masks[1], cfa, sums[1] * 0.5)
    b = jnp.where(masks[2], cfa,
                  jnp.where(masks[1],
                            jnp.where(solitary, sums[2],
                                      sums[2] * 1.3333333),
                            sums[2]))
    return jnp.stack([r, g, b])


def demosaic_xtrans(cfa, xtrans_pattern, method="3-pass (best)", **kwargs):
    m = method.lower()
    if m in ("mono", "none"):
        return jnp.stack([cfa, cfa, cfa])
    return fast_xtrans(cfa, xtrans_pattern)
