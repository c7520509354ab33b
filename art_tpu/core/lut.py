"""Device-side LUT application.

The reference applies 65536-entry `LUTf` tables with clip-aware linear
interpolation (`rtengine/LUT.h:77-99`). Here a LUT is a plain jnp array and
application is a gather + lerp; XLA lowers this to a vectorized dynamic
gather. Hot paths that chain multiple LUTs should compose them on host
first (the planner does this for tone curves).
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import MAXVAL


def apply_lut(x, lut, in_max=MAXVAL):
    """Look up `x` (0..in_max domain) in `lut` with linear interpolation.

    Values outside the domain clamp to the LUT endpoints, matching the
    reference's ClipType::CLIP behaviour (LUT.h).
    """
    n = lut.shape[0]
    idx = x * ((n - 1) / in_max)
    idx = jnp.clip(idx, 0.0, n - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    frac = idx - i0.astype(idx.dtype)
    v0 = jnp.take(lut, i0)
    v1 = jnp.take(lut, i1)
    return v0 + (v1 - v0) * frac


def apply_lut01(x, lut):
    """LUT lookup for x in [0, 1]."""
    return apply_lut(x, lut, in_max=1.0)
