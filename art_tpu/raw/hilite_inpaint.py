"""Highlight reconstruction, "Color" mode (reference:
rtengine/hilite_recon.cc HLRecovery_inpaint :299).

The reference propagates unclipped color into blown regions with four
directional scan passes over a 4x-downsampled pyramid and re-imposes the
measured luminance. Sequential directional scans are hostile to XLA, so
this implementation solves the same problem as masked Jacobi diffusion on
a downscaled grid (a fixed-iteration lax.fori_loop of 3x3 normalized box
means — each step spreads known color one cell further into the clipped
region), then reconstructs full-resolution clipped channels from the
inpainted chroma field with a per-pixel least-squares gain against the
surviving unclipped channels. Documented deviation: diffusion fill instead
of 8-way scans; the fill converges to the same harmonic-interpolation
limit the scans approximate.

Domain conventions match recover_opposed (raw/hilite.py): input is the
demosaiced (3, H, W) stack in the scaleColors domain, clip levels derive
from the chosen WB's camera-space multipliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_FACTOR = 8
_ITERS = 64
_EPS = 1e-6


def _box3(x):
    """3x3 box sum per plane of (C, h, w) (zero-padded)."""
    return lax.reduce_window(x, 0.0, lax.add, (1, 3, 3), (1, 1, 1), "SAME")


def _downscale(x, f):
    """Box downscale (C, H, W) by factor f (H, W assumed divisible)."""
    c, h, w = x.shape
    return x.reshape(c, h // f, f, w // f, f).mean(axis=(2, 4))


def recover_inpaint(rgb, scale_mul3, wb_cam3):
    """Inpaint-reconstruct clipped highlights; same signature/domain as
    recover_opposed."""
    gain = 1.2
    clipval = 0.987 / gain
    scalecoeffs = scale_mul3 * wb_cam3 / 65535.0
    clips = clipval * wb_cam3

    x = jnp.maximum(rgb * scalecoeffs[:, None, None], 0.0)
    c, h, w = x.shape
    f = _FACTOR
    ph = (-h) % f
    pw = (-w) % f
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge")

    clipped = x >= clips[:, None, None]
    any_clip_full = jnp.any(clipped, axis=0)

    # --- coarse grid fill ---
    ds = _downscale(xp, f)
    m = _downscale(jnp.pad(any_clip_full.astype(x.dtype),
                           ((0, ph), (0, pw)), mode="edge")[None], f)[0]
    known = (m < 0.02).astype(x.dtype)  # cells with trustworthy color

    u0 = ds * known[None]
    w0 = known

    def body(_, uw):
        u, wgt = uw
        us = _box3(u)
        ws = _box3(wgt[None])[0]
        fill = us / jnp.maximum(ws, _EPS)[None]
        have = (ws > _EPS).astype(u.dtype)
        u = jnp.where(known[None] > 0, ds,
                      jnp.where(wgt[None] > 0, u, fill * have[None]))
        wgt = jnp.maximum(wgt, have * (1.0 - known) * (ws > _EPS))
        return u, wgt

    uf, _ = lax.fori_loop(0, _ITERS, body, (u0, w0))

    # upsample the filled color field to full resolution
    fr = jax.image.resize(uf, (c, h + ph, w + pw), method="bilinear")
    fr = fr[:, :h, :w]
    fr = jnp.maximum(fr, _EPS)

    # per-pixel gain: least squares against surviving unclipped channels;
    # fully-clipped pixels fall back to the luminance ratio (>= 1 so the
    # result never darkens a blown area)
    unc = (~clipped).astype(x.dtype)
    num = jnp.sum(unc * x * fr, axis=0)
    den = jnp.sum(unc * fr * fr, axis=0)
    s_ls = num / jnp.maximum(den, _EPS)
    lum_x = jnp.mean(x, axis=0)
    lum_f = jnp.mean(fr, axis=0)
    s_lum = jnp.maximum(lum_x / jnp.maximum(lum_f, _EPS), 1.0)
    n_unc = jnp.sum(unc, axis=0)
    s = jnp.where(n_unc > 0, s_ls, s_lum)

    cand = s[None] * fr
    out = jnp.where(clipped, jnp.maximum(x, cand), x)
    return out / scalecoeffs[:, None, None]
