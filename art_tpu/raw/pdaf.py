"""PDAF lines filter (reference: pdaflinesfilter.cc).

On-sensor phase-detect rows (Sony etc.) read slightly low on green,
leaving horizontal banding. The affected rows repeat with a
camera-specific pattern + offset (camconst.json pdaf_pattern/offset).

TPU formulation: a host-built row mask marks PDAF rows; each marked
row's green sites are rescaled by the ratio of a smoothed neighbor-row
green profile (rows +-2, same CFA coset) to the row's own smoothed
profile, gated to a small correction range — the reference's gated
per-pixel averaging expressed as a whole-plane multiplicative fix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pdaf_row_mask(pattern_rows, offset, height):
    """Boolean (H,) host mask: row is PDAF when
    (row - offset) % pattern[-1] is in the pattern
    (pdaflinesfilter.cc:145)."""
    period = max(int(pattern_rows[-1]), 1)
    keys = set(int(v) % period for v in pattern_rows)
    rows = (np.arange(height) - int(offset)) % period
    return np.isin(rows, sorted(keys))


def _smooth_rows(x, r=8):
    """Horizontal box smoothing per row (cheap 1-D profile)."""
    h, w = x.shape
    c = jnp.cumsum(x, axis=1)
    zero = jnp.zeros((h, 1), x.dtype)
    c = jnp.concatenate([zero, c], axis=1)
    hi = jnp.clip(jnp.arange(w) + r + 1, 0, w)
    lo = jnp.clip(jnp.arange(w) - r, 0, w)
    s = jnp.take(c, hi, axis=1) - jnp.take(c, lo, axis=1)
    return s / (hi - lo).astype(x.dtype)


def pdaf_filter(cfa, green_mask, row_mask):
    """Correct marked rows' green sites toward their +-2 row neighbors."""
    g = jnp.where(green_mask, cfa, 0.0)
    gm = green_mask.astype(cfa.dtype)
    up = jnp.roll(g, 2, axis=0)
    dn = jnp.roll(g, -2, axis=0)
    upm = jnp.roll(gm, 2, axis=0)
    dnm = jnp.roll(gm, -2, axis=0)
    neigh = _smooth_rows(up + dn) / jnp.maximum(_smooth_rows(upm + dnm),
                                                1e-6)
    own = _smooth_rows(g) / jnp.maximum(_smooth_rows(gm), 1e-6)
    ratio = jnp.clip(neigh / jnp.maximum(own, 1e-6), 0.95, 1.05)
    rm = row_mask.astype(cfa.dtype)[:, None]
    corr = 1.0 + (ratio - 1.0) * rm
    return jnp.where(green_mask, cfa * corr, cfa)
