"""Spot removal (reference: ipspot.cc, procparams.h SpotEntry:1144).

Each spot heals a feathered circular window from a source position onto
the target position using the GIMP-heal algorithm (ipspot.cc:85
heal_laplace_loop / :154 heal): the detail-weighted difference
diff = w * (dst - src) is relaxed toward a harmonic (Laplace) fill
inside the feather circle, then result = src + diff is blended over the
target with opacity inside the radius falling off as a gaussian
exp(-(r-radius)^2/sigma) out to the feather radius
(SpotEntry::getFeatherRadius, feather_factor ipspot.cc:56).

TPU formulation: each spot is a static-shape window pair — two static
slices and one update per spot, with host-precomputed feather/detail
planes. The reference's in-place row-sequential SOR sweep (omega = 1.4)
becomes red-black SOR inside a ``lax.fori_loop``: the checkerboard
half-sweeps are fully vectorized and propagate like Gauss-Seidel, with
the same iteration budget min(2*size, 1000) (ipspot.cc:91).
"""

from __future__ import annotations

import math

import numpy as np

_OMEGA = 1.4  # SOR overrelaxation (ipspot.cc:95)
_MAX_ITER = 1000


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
        # sigma so the falloff hits ~0.5% at the feather radius
        # (find_sigma, ipspot.cc:37)
        span = max(feather_r - e.radius, 1e-3)
        sigma = span * span / math.log(200.0)
        fall = np.exp(-np.maximum(r - e.radius, 0.0) ** 2 / sigma)
        blend = np.where(r <= e.radius, 1.0, fall)
        blend = np.where(r <= feather_r, blend, 0.0) * float(e.opacity)

        # detail weight on the seeded difference (ipspot.cc:182):
        # w = 1 - clip01(radius - r)/radius ** (0.125*(detail+1))
        detail_exp = 0.125 * (float(e.detail) + 1.0)
        wdet = 1.0 - np.power(
            np.clip(e.radius - r, 0.0, 1.0) / max(e.radius, 1), detail_exp)
        heal = (r <= feather_r)  # PDE domain (ipspot.cc:181 mask)
        # checkerboard parity for the red-black half sweeps
        red = ((yy + xx).astype(np.int32) % 2) == 0
        iters = min(2 * size, _MAX_ITER)

        statics.append((sy, sx, ty, tx, size, iters))
        masks.append((blend.astype(np.float32)[None],
                      wdet.astype(np.float32)[None],
                      (heal & red).astype(np.float32)[None],
                      (heal & ~red).astype(np.float32)[None]))
    if not statics:
        return None
    blends, wdets, reds, blacks = zip(*masks)
    return tuple(statics), {"blends": list(blends), "wdets": list(wdets),
                            "reds": list(reds), "blacks": list(blacks)}


def _heal_laplace(diff, red, black, iters):
    """Red-black SOR Laplace relaxation of the masked window
    (heal_laplace_loop, ipspot.cc:85)."""
    import jax
    import jax.numpy as jnp

    w1 = 1.0 - _OMEGA
    w2 = _OMEGA / 4.0

    def half(d, par):
        lap = (jnp.roll(d, 1, axis=-2) + jnp.roll(d, -1, axis=-2)
               + jnp.roll(d, 1, axis=-1) + jnp.roll(d, -1, axis=-1))
        upd = d * w1 + lap * w2
        return d + (upd - d) * par

    def body(_, d):
        return half(half(d, red), black)

    return jax.lax.fori_loop(0, iters, body, diff)


def apply(rgb, data, static):
    out = rgb
    for (sy, sx, ty, tx, size, iters), blend, wdet, red, black in zip(
            static, data["blends"], data["wdets"], data["reds"],
            data["blacks"]):
        src = out[:, sy : sy + size, sx : sx + size]
        tgt = out[:, ty : ty + size, tx : tx + size]
        diff = _heal_laplace(wdet * (tgt - src), red, black, iters)
        healed = src + diff
        result = tgt + (healed - tgt) * blend
        out = out.at[:, ty : ty + size, tx : tx + size].set(result)
    return out
