"""Spot removal (reference: ipspot.cc, procparams.h SpotEntry:1144).

Clone-stamp each spot: copy a feathered circular window from the source
position onto the target position. The blend factor is opacity inside the
radius, falling off as a gaussian exp(-(r-radius)^2/sigma) out to the
feather radius = radius*(1+feather) (SpotEntry::getFeatherRadius,
feather_factor ipspot.cc:56).

TPU formulation: each spot is a static-shape window pair — two static
slices and one update per spot, with a host-precomputed feather mask.
The reference's GIMP-heal "detail" mode is approximated by plain cloning
(the clone already preserves source detail; the heal PDE is a later
refinement).
"""

from __future__ import annotations

import math

import numpy as np


def _entry_window(e, h, w):
    """Static geometry for one spot entry, clamped to the true image."""
    fr = int(math.ceil(e.radius * (1.0 + e.feather))) + 1
    size = 2 * fr + 1

    def clamp(cx, cy):
        x0 = min(max(int(cx) - fr, 0), max(w - size, 0))
        y0 = min(max(int(cy) - fr, 0), max(h - size, 0))
        return y0, x0

    sy, sx = clamp(e.source_x, e.source_y)
    ty, tx = clamp(e.target_x, e.target_y)
    return sy, sx, ty, tx, size, fr


def plan(pp, ctx):
    sp = getattr(pp, "spot", None)
    if sp is None or not sp.enabled or not sp.entries:
        return None
    frame = ctx["frame"]
    if frame.is_raw:
        h, w = frame.cfa.shape
    else:
        h, w = frame.rgb.shape[-2:]

    statics = []
    masks = []
    for e in sp.entries:
        if e.radius <= 0:
            continue
        sy, sx, ty, tx, size, fr = _entry_window(e, h, w)
        if size > min(h, w):
            continue
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        r = np.sqrt((yy - fr) ** 2 + (xx - fr) ** 2)
        feather_r = e.radius * (1.0 + e.feather)
        # sigma so the falloff hits 1% at the feather radius
        span = max(feather_r - e.radius, 1e-3)
        sigma = span * span / math.log(100.0)
        fall = np.exp(-np.maximum(r - e.radius, 0.0) ** 2 / sigma)
        mask = np.where(r <= e.radius, 1.0, fall)
        mask = np.where(r <= feather_r, mask, 0.0) * float(e.opacity)
        statics.append((sy, sx, ty, tx, size))
        masks.append(mask.astype(np.float32)[None])  # (1, size, size)
    if not statics:
        return None
    return tuple(statics), {"masks": masks}


def apply(rgb, data, static):
    out = rgb
    for (sy, sx, ty, tx, size), mask in zip(static, data["masks"]):
        src = out[:, sy : sy + size, sx : sx + size]
        tgt = out[:, ty : ty + size, tx : tx + size]
        blended = tgt * (1.0 - mask) + src * mask
        out = out.at[:, ty : ty + size, tx : tx + size].set(blended)
    return out
