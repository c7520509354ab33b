"""Local contrast (reference: iplocalcontrast.cc, darktable-lineage).

Per-region wavelet detail amplification of L: à trous decomposition, each
level scaled by a factor from the region's level curve (WavOpacityCurveWL)
and the contrast slider, masked per region.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import FlatCurve
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
from art_tpu.core.image import MAXVAL
from art_tpu.masks import eval_mask, plan_mask, regions_from_extra
from art_tpu.ops.wavelet import atrous_decompose, atrous_reconstruct

GROUP = "Local Contrast"

FIELDS = {
    "contrast": ("Contrast", "f", 0.0),
    "curve": ("Curve", "dl", []),
}

LEVELS = 6


def plan(pp, ctx):
    regions = regions_from_extra(pp, GROUP, FIELDS)
    if not regions:
        return None
    h, w = ctx.get("op_dims") or ctx["frame"].shape
    ws = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    data = {"ws": ws.astype(np.float32), "lum_w": ws[1].astype(np.float32)}
    statics = []
    for ridx, (params, mask) in enumerate(regions):
        contrast = params["contrast"]
        curve = FlatCurve(params["curve"], periodic=False,
                          identity_value=0.0)
        if contrast == 0 and curve.is_identity():
            continue
        # per-level boost factors: curve sampled at level positions
        # (0 = finest), plus the global contrast gain
        pos = np.linspace(0.0, 1.0, LEVELS)
        lvl = curve.get_val(pos) if not curve.is_identity() else np.zeros(
            LEVELS)
        base_gain = contrast / 100.0
        factors = 1.0 + base_gain + 4.0 * lvl
        mstatic, mdata = plan_mask(mask, (h, w), pp)
        data[f"lc{ridx}"] = {
            "mask": mdata,
            "factors": factors.astype(np.float32),
        }
        statics.append((mstatic, ridx))
    if not statics:
        return None
    return tuple(statics), data


def apply(rgb, data, static):
    ws = data["ws"]
    lw = data["lum_w"]
    x01 = rgb / MAXVAL
    for (mstatic, ridx) in static:
        p = data[f"lc{ridx}"]
        mask = eval_mask(rgb, ws, mstatic, p["mask"])
        y, u, v = rgb_to_yuv(x01, lw)
        details, resid = atrous_decompose(y, LEVELS)
        boosted = [d * p["factors"][i] for i, d in enumerate(details)]
        y2 = atrous_reconstruct(boosted, resid)
        f = jnp.where(y > 1e-6, y2 / jnp.maximum(y, 1e-6), 1.0)
        sm = yuv_to_rgb(y2, u * f, v * f, lw)
        x01 = sm * mask[None] + x01 * (1.0 - mask[None])
    return x01 * MAXVAL
