"""Texture boost (reference: iptextureboost.cc).

Per-region two-scale detail amplification: mid = guided(Y, r), base =
guided(mid, 4r); Y' = base + (Y-mid)*strength + (mid-base)*strength2,
iterated with halving blend; masked per region. Operates on luminance of
the working image (log-safe clamped).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
from art_tpu.core.image import MAXVAL
from art_tpu.masks import eval_mask, plan_mask, regions_from_extra
from art_tpu.ops.filters import guided_filter

GROUP = "TextureBoost"

FIELDS = {
    "strength": ("Strength", "f", 0.0),
    "detail_threshold": ("DetailThreshold", "f", 0.2),
    "iterations": ("Iterations", "i", 1),
}


def plan(pp, ctx):
    regions = regions_from_extra(pp, GROUP, FIELDS)
    if not regions:
        return None
    h, w = ctx.get("op_dims") or ctx["frame"].shape
    ws = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    data = {"ws": ws.astype(np.float32), "lum_w": ws[1].astype(np.float32)}
    statics = []
    for ridx, (params, mask) in enumerate(regions):
        if params["strength"] == 0:
            continue
        mstatic, mdata = plan_mask(mask, (h, w), pp)
        s = params["strength"]
        s = (s / 2.0) ** 0.3 * 2.0 if s >= 0 else s
        strength = 1.0 + s if s >= 0 else 1.0 / (1.0 - s)
        strength2 = 1.0 + s / 4.0 if s >= 0 else 1.0 / (1.0 - s / 2.0)
        full_radius = params["detail_threshold"] * 3.5
        radius = max(int(full_radius + 0.5), 1)
        data[f"tb{ridx}"] = {
            "mask": mdata,
            "strength": np.float32(strength),
            "strength2": np.float32(strength2),
        }
        statics.append((radius, max(int(params["iterations"]), 1),
                        mstatic, ridx))
    if not statics:
        return None
    return tuple(statics), data


def apply(rgb, data, static):
    ws = data["ws"]
    lw = data["lum_w"]
    x01 = rgb / MAXVAL
    for (radius, iterations, mstatic, ridx) in static:
        p = data[f"tb{ridx}"]
        mask = eval_mask(rgb, ws, mstatic, p["mask"])
        y, u, v = rgb_to_yuv(x01, lw)
        yy = jnp.clip(y, 1e-5, 32.0)
        mid = yy
        minval = jnp.min(yy)
        out = yy
        for i in range(iterations):
            blend = 1.0 / (2.0 ** i)
            mid = guided_filter(mid, mid, radius, 0.001)
            base = guided_filter(mid, mid, radius * 4, 0.0001)
            d = (out - mid) * p["strength"]
            d2 = (mid - base) * p["strength2"]
            boosted = jnp.maximum(base + d + d2, minval)
            out = blend * boosted + (1 - blend) * out
        f = out / jnp.maximum(yy, 1e-9)
        y2 = y * f
        u2 = u * f
        v2 = v * f
        sm = yuv_to_rgb(y2, u2, v2, lw)
        x01 = sm * mask[None] + x01 * (1.0 - mask[None])
    return x01 * MAXVAL
