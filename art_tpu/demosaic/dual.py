"""Dual demosaic: blend a detail demosaicer with a smooth one by local
contrast (reference: dual_demosaic_RT.cc; mask: rt_algo.cc buildBlendMask).

High-contrast regions keep the detail method (AMaZE/RCD); flat regions take
the artifact-free smooth method (bilinear/VNG4), suppressing maze patterns
in low-contrast areas. The blend mask is a sigmoid of the local Lab-L
gradient magnitude against a contrast threshold; `auto` calibrates the
threshold from the flattest usable tile (calcContrastThreshold: smallest
threshold for which the flat tile blends <= 1% toward the detail method).

TPU formulation: the auto search runs in-graph — tile variance reduction
by reshape, argmin tile select with take, and the 100-candidate threshold
scan as one broadcast sigmoid reduction — instead of the reference's
early-exit scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.demosaic.registry import register
from art_tpu.ops.filters import gauss_blur

_TILE = 64


def _lab_l(rgb):
    """Lab L in the reference's 0..32768 domain (Color::RGB2L)."""
    y = (0.212671 * rgb[0] + 0.715160 * rgb[1] + 0.072169 * rgb[2]) \
        * (1.0 / 65535.0)
    eps = (6.0 / 29.0) ** 3
    f = jnp.where(y > eps, jnp.cbrt(jnp.maximum(y, 1e-12)),
                  y / (3.0 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)
    return (116.0 * f - 16.0) * 327.68


def _contrast_map(lum):
    p = jnp.pad(lum, 2, mode="edge")
    h, w = lum.shape

    def sh(dy, dx):
        return p[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]

    scale = 0.0625 / 327.68
    return jnp.sqrt(
        (sh(0, 1) - sh(0, -1)) ** 2 + (sh(1, 0) - sh(-1, 0)) ** 2
        + (sh(0, 2) - sh(0, -2)) ** 2 + (sh(2, 0) - sh(-2, 0)) ** 2
    ) * scale


def _sigmoid_blend(contrast, threshold):
    """calcBlendFactor: 1/(1+exp(12*(thr-contrast)))-style gate.

    rt_algo.cc:47 uses k=12/thr normalized; keep the sharpen module's
    16/thr slope for consistency across our mask users.
    """
    t = jnp.maximum(threshold, 1e-5)
    return 1.0 / (1.0 + jnp.exp(jnp.clip(16.0 - 16.0 * contrast / t,
                                         -40.0, 40.0)))


def _auto_threshold(lum, contrast):
    """In-graph calcContrastThreshold approximation.

    Pick the flattest tile whose mean luminance is usable (2000..20000 in
    the 0..32768 L domain) and variance non-degenerate, then the smallest
    threshold in {0.01..1.00} for which that tile's mean blend factor
    drops below 1%.
    """
    h, w = lum.shape
    th, tw = h // _TILE, w // _TILE
    lt = lum[: th * _TILE, : tw * _TILE].reshape(th, _TILE, tw, _TILE)
    avg = lt.mean(axis=(1, 3))
    var = ((lt - avg[:, None, :, None]) ** 2).mean(axis=(1, 3))
    valid = (avg >= 2000.0) & (avg <= 20000.0) & (var >= 0.5)
    score = jnp.where(valid, var, jnp.inf)
    flat = jnp.argmin(score.ravel())

    ct = contrast[: th * _TILE, : tw * _TILE].reshape(
        th, _TILE, tw, _TILE).transpose(0, 2, 1, 3).reshape(
        th * tw, _TILE * _TILE)
    tile_c = jnp.take(ct, flat, axis=0)  # (_TILE*_TILE,)

    cand = (jnp.arange(100, dtype=lum.dtype) + 1.0) / 100.0
    mean_blend = _sigmoid_blend(tile_c[None, :], cand[:, None]).mean(axis=1)
    ok = mean_blend <= 0.01
    idx = jnp.argmax(ok)  # first passing candidate
    thr = jnp.where(jnp.any(ok), cand[idx], 1.0)
    # no usable tile at all -> fall back to the default slider value
    return jnp.where(jnp.isinf(score.ravel()[flat]), 0.2, thr)


def dual_blend(rgb_sharp, rgb_flat, contrast=20.0, auto=False):
    """Blend two demosaic results; contrast is the 0..100 slider."""
    lum = _lab_l(rgb_sharp)
    cmap = _contrast_map(lum)
    if auto:
        thr = _auto_threshold(lum, cmap)
    else:
        thr = jnp.asarray(contrast / 100.0, lum.dtype)
    blend = _sigmoid_blend(cmap, thr)
    blend = gauss_blur(blend, 2.0)
    return blend[None] * rgb_sharp + (1.0 - blend[None]) * rgb_flat


def _make(sharp_name, flat_name):
    def fn(cfa, pattern, dual_contrast=20.0, dual_auto=False, **kw):
        from art_tpu.demosaic import registry
        from art_tpu.demosaic.bilinear import bayer_bilinear

        sharp = registry.get(sharp_name)(cfa, pattern, **kw)
        if not dual_auto and dual_contrast <= 0.0:
            return sharp
        if flat_name == "bilinear":
            flat = bayer_bilinear(cfa, pattern)
        else:
            flat = registry.get(flat_name)(cfa, pattern)
        return dual_blend(sharp, flat, dual_contrast, dual_auto)

    return fn


for _sharp in ("amaze", "rcd"):
    for _flat in ("bilinear", "vng4"):
        register(f"{_sharp}{_flat}")(_make(_sharp, _flat))
# DCB isn't implemented; its dual variants route to RCD (closest quality)
register("dcbbilinear")(_make("dcb", "bilinear"))
register("dcbvng4")(_make("dcb", "vng4"))
