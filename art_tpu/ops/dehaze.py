"""Dehaze (reference: ipdehaze.cc — dark-channel prior, guided-filter
transmission refinement, luminance-only option).

TPU formulation: patch minima via `lax.reduce_window`; ambient light
estimated on a ~200px downsample with sorted percentiles (tiny arrays,
done on device inside the jit); strength is a flat curve over
gamma-encoded luminance baked to a device curve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import FlatCurve
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import guided_filter


def plan(pp, ctx):
    d = pp.dehaze
    if not d.enabled:
        return None
    strength_curve = FlatCurve(d.strength, periodic=False,
                               identity_value=0.5)
    x = np.linspace(0.0, 1.0, 65536)
    xe = cs.srgb_gamma(x, np)
    s = (strength_curve.get_val(xe) - 0.5) * 1.3
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {
        "scoeffs": fit_curve(s),  # signed strength vs encoded luminance
        "lum_w": lum_w.astype(np.float32),
        "depth": np.float32(-d.depth / 100.0),
    }
    return (bool(d.luminance), bool(d.show_depth_map),
            int(d.blackpoint)), data


def _patch_min(x, patch):
    mn = jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min, (patch, patch), (patch, patch), "SAME")
    return jnp.repeat(jnp.repeat(mn, patch, 0), patch, 1)[
        : x.shape[0], : x.shape[1]]


def _downsample(x, factor):
    return x[::factor, ::factor]


def apply(rgb, data, static):
    luminance, show_depth, blackpoint = static
    lw = data["lum_w"]
    h, w = rgb.shape[1:]

    maxchan = jnp.maximum(jnp.max(rgb), 1e-6)
    img = rgb / maxchan

    patch = max(int(5), 2)
    # smoothed channels (guided self-filter, eps 0.1)
    R = guided_filter(img[0], img[0], patch, 0.1)
    G = guided_filter(img[1], img[1], patch, 0.1)
    B = guided_filter(img[2], img[2], patch, 0.1)

    # ambient estimation on a ~200-cap downsample
    factor = max(1, min(h, w) // 200)
    RR, GG, BB = (_downsample(c, factor) for c in (R, G, B))
    dmin = jnp.minimum(jnp.minimum(RR, GG), BB)
    D = jax.lax.reduce_window(dmin, jnp.inf, jax.lax.min, (2, 2), (2, 2),
                              "SAME")
    dvalid = jnp.where((D >= 0) & (D <= 1.0 - 1e-5), D, -jnp.inf)
    flat = dvalid.reshape(-1)
    n_valid = jnp.sum(jnp.isfinite(flat) & (flat > -jnp.inf))
    sortd = jnp.sort(flat)  # ascending; invalid (-inf) first
    k = jnp.clip((flat.shape[0] - n_valid)
                 + (0.95 * n_valid).astype(jnp.int32), 0,
                 flat.shape[0] - 1)
    darklim = sortd[k]

    # patches mask upsampled back to the downsample grid
    patch_mask = (D >= darklim) & (D >= 0) & (D <= 1.0)
    pm_full = jnp.repeat(jnp.repeat(patch_mask, 2, 0), 2, 1)[
        : RR.shape[0], : RR.shape[1]]
    ssum = RR + GG + BB
    bright_vals = jnp.where(pm_full, ssum, -jnp.inf)
    bflat = jnp.sort(bright_vals.reshape(-1))
    nb = jnp.sum(bright_vals > -jnp.inf)
    kb = jnp.clip((bflat.shape[0] - nb) + (0.95 * nb).astype(jnp.int32),
                  0, bflat.shape[0] - 1)
    bright_lim = bflat[kb]

    amb_mask = pm_full & (ssum >= bright_lim)
    n = jnp.maximum(jnp.sum(amb_mask), 1)
    ambient = jnp.stack([
        jnp.sum(jnp.where(amb_mask, RR, 0.0)) / n,
        jnp.sum(jnp.where(amb_mask, GG, 0.0)) / n,
        jnp.sum(jnp.where(amb_mask, BB, 0.0)) / n,
    ])
    ambient = jnp.maximum(ambient, 1e-6)
    max_t = jnp.where(darklim > 0, -1.125 * jnp.log(darklim), 44.0)

    # transmission from full-res dark channel normalized by ambient
    dark = _patch_min(jnp.minimum(
        jnp.minimum(R / ambient[0], G / ambient[1]), B / ambient[2]), patch)
    dark = jnp.clip(dark, 0.0, 1.0)

    y_lum = lw[0] * img[0] + lw[1] * img[1] + lw[2] * img[2]
    # strength indexed by the unnormalized luminance (reference Y*maxchan)
    s = eval_curve(jnp.clip(y_lum * maxchan, 0, 1.0) * MAXVAL,
                   data["scoeffs"], out_max=1.0)
    add_haze = s < 0
    t_tilde = 1.0 - jnp.abs(s) * dark

    t = guided_filter(img[2], t_tilde, patch * 4, 1e-5)

    t0 = jnp.maximum(1e-6, jnp.exp(data["depth"] * max_t))
    tl = 1.0 - jnp.minimum(jnp.minimum(
        img[0] / ambient[0], img[1] / ambient[1]), img[2] / ambient[2])
    mt = jnp.maximum(jnp.maximum(t, t0), tl + 1e-6)

    if show_depth:
        depth_img = jnp.clip(1.0 - mt, 0.0, 1.0)
        return jnp.stack([depth_img] * 3) * MAXVAL

    if luminance:
        ambient_y = lw[0] * ambient[0] + lw[1] * ambient[1] + lw[2] * ambient[2]
        yy = (y_lum - ambient_y) / mt + ambient_y
        yy = jnp.where(add_haze, y_lum + y_lum - yy, yy)
        f = jnp.where(y_lum > 1e-5, yy / jnp.maximum(y_lum, 1e-5), 1.0)
        out = img * f[None]
    else:
        deh = (img - ambient[:, None, None]) / mt[None] + ambient[:, None, None]
        out = jnp.where(add_haze[None], img + (img - deh), deh)
    return out * maxchan
