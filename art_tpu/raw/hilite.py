"""Highlight reconstruction (reference: rtengine/hilite_recon.cc).

Modes (ExposureParams::HR_*):
- "opposed" (HR_COLORSOFT / "Balanced", the default quality mode):
  highlight_recovery_opposed:1355 — clipped channels take the cube-root
  average of the opposed channels' 3x3 means plus a global chrominance
  offset estimated from near-clip pixels; masks dilated 3x3.
- "blend" (HR_BLEND): HLRecovery_blend luminance blending (applied after
  demosaic in getImage).
- "inpaint" (HR_COLOR): HLRecovery_inpaint (hilite_recon.cc:299) —
  implemented in raw/hilite_inpaint.py (diffusion fill).

Runs after demosaic on the WB-scaled RGB planes, whole-plane.

TPU notes: 3x3 stencils go through lax.reduce_window (one fused pass over
the (3,H,W) stack); cube/cbrt avoid the generic pow lowering.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

HL_POWER = 3.0


def _box3_mean3(x3):
    """3x3 box mean over each plane of a (3,H,W) stack (edge-clamped)."""
    p = jnp.pad(jnp.maximum(x3, 0.0), ((0, 0), (1, 1), (1, 1)), mode="edge")
    s = lax.reduce_window(p, 0.0, lax.add, (1, 3, 3), (1, 1, 1), "VALID")
    return s / 9.0


def _dilate3_mask(m3):
    """3x3 max (dilate) over each plane of a (3,H,W) boolean stack."""
    return lax.reduce_window(m3, False, lax.bitwise_or, (1, 3, 3),
                             (1, 1, 1), "SAME")


def recover_opposed(rgb, scale_mul3, wb_cam3):
    """rgb: (3,H,W) demosaiced planes BEFORE getImage multipliers (i.e. in
    scaleColors domain). scale_mul3: per-channel scale_mul; wb_cam3: the
    chosen WB's camera-space multipliers (wbMul2Camera output)."""
    gain = 1.2
    clipval = 0.987 / gain
    scalecoeffs = scale_mul3 * wb_cam3 / 65535.0
    clips = clipval * wb_cam3
    clipdark = jnp.stack([0.03 * clips[0], 0.125 * clips[1], 0.03 * clips[2]])

    x = rgb * scalecoeffs[:, None, None]

    means = _box3_mean3(x)
    croot = jnp.cbrt(jnp.maximum(means, 0.0))
    croot_refavg = jnp.stack([
        0.5 * (croot[1] + croot[2]),
        0.5 * (croot[0] + croot[2]),
        0.5 * (croot[0] + croot[1]),
    ])
    est = croot_refavg * croot_refavg * croot_refavg

    clipped = x >= clips[:, None, None]
    mask = _dilate3_mask(clipped)

    # global chrominance offset from near-clip pixels inside the dilated mask
    inval = jnp.maximum(x, 0.0)
    sel = mask & (inval > clipdark[:, None, None]) & (
        inval < clips[:, None, None])
    cr_sum = jnp.sum(jnp.where(sel, inval - est, 0.0), axis=(1, 2))
    cr_cnt = jnp.maximum(jnp.sum(sel, axis=(1, 2)), 1)
    chrom = cr_sum / cr_cnt

    recovered = jnp.maximum(inval, est + chrom[:, None, None])
    out = jnp.where(clipped, recovered, x)
    return out / scalecoeffs[:, None, None]


def recover_blend(rgb, hlmax3):
    """HLRecovery_blend-style luminance blend: where any channel exceeds
    its clip level, push colors toward the clipped-luminance gray.
    Simplified whole-plane version of rawimagesource HLRecovery_blend."""
    maxval = 65535.0
    clip = jnp.minimum(hlmax3, maxval)
    frac = jnp.clip((rgb - 0.75 * clip[:, None, None])
                    / (0.25 * clip[:, None, None]), 0.0, 1.0)
    anyclip = jnp.max(frac, axis=0)
    lum = rgb.mean(axis=0)
    blended = rgb * (1 - anyclip[None]) + lum[None] * anyclip[None]
    return jnp.where(anyclip[None] > 0, blended, rgb)
