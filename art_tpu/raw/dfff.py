"""Dark-frame subtraction and flat-field correction.

Reference: rawimagesource.cc copyOriginalPixels + rawflatfield.cc
(cfaboxblur per CFA channel; correction = channel reference level /
blurred flat, with the blur type Area / Vertical / Horizontal / V+H and
radius from FlatFieldBlurRadius). Both run on raw ADU values before
black subtraction and scaling, exactly like the reference.

TPU formulation: the Bayer flat blurs run on the four 2x2 subgrids
(radius halved), X-Trans uses mask-normalized box sums per color.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.ops.filters import box_blur


def subtract_dark(cfa, dark):
    return jnp.maximum(cfa - dark, 0.0)


def _blur_sub(sub, radius, blur_type):
    if blur_type == "v":
        return box_blur(sub, 0) if radius <= 0 else _box_axis(sub, radius, 0)
    if blur_type == "h":
        return _box_axis(sub, radius, 1)
    if blur_type == "vh":
        return _box_axis(_box_axis(sub, radius, 0), radius, 1)
    return box_blur(sub, radius)


def _box_axis(a, r, axis):
    n = a.shape[axis]
    c = jnp.cumsum(a, axis=axis)
    zero = jnp.zeros_like(jnp.take(c, jnp.arange(1), axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)
    hi = jnp.clip(jnp.arange(n) + r + 1, 0, n)
    lo = jnp.clip(jnp.arange(n) - r, 0, n)
    s = jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)
    cnt = (hi - lo).astype(a.dtype)
    shape = [1] * a.ndim
    shape[axis] = n
    return s / cnt.reshape(shape)


def apply_flatfield_bayer(cfa, flat, blur_type="area", radius=32):
    """cfa, flat: (H, W) raw ADU planes, same sensor."""
    from art_tpu.core.image import subgrid2, subgrid2_scatter

    h, w = cfa.shape
    rsub = max(int(radius) // 2, 1)
    # build the full-res correction field from the four per-site
    # subplanes (disjoint scatters sum exactly), then one multiply —
    # strided .at[py::2, px::2] updates lower to a slow path at 24MP
    corr_full = None
    for py in (0, 1):
        for px in (0, 1):
            sub_f = subgrid2(flat, py, px)
            blurred = _blur_sub(sub_f, rsub, blur_type)
            ref = jnp.mean(blurred)
            corr = ref / jnp.maximum(blurred, 1e-3)
            # the reference guards insane corrections from dust/defects
            corr = jnp.clip(corr, 0.25, 4.0)
            up = subgrid2_scatter(corr, (h, w), py, px)
            corr_full = up if corr_full is None else corr_full + up
    return cfa * corr_full


def apply_flatfield_xtrans(cfa, flat, cidx, blur_type="area", radius=32):
    """X-Trans: mask-normalized blur per color plane."""
    out = cfa
    r = max(int(radius), 1)
    for c in range(3):
        m = (cidx == c).astype(cfa.dtype)
        num = _blur_sub(flat * m, r, blur_type)
        den = _blur_sub(m, r, blur_type)
        blurred = num / jnp.maximum(den, 1e-6)
        ref = jnp.sum(flat * m) / jnp.maximum(jnp.sum(m), 1.0)
        corr = jnp.clip(ref / jnp.maximum(blurred, 1e-3), 0.25, 4.0)
        out = jnp.where(cidx == c, out * corr, out)
    return out
