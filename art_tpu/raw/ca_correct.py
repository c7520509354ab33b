"""Raw chromatic aberration correction (reference: CA_correct_RT.cc).

The reference fits per-tile polynomial shift surfaces of R/B relative to G
on the Bayer mosaic (auto mode) or applies user radial coefficients
(manual), then resamples the R/B subplanes by the fitted shifts.

TPU formulation: R and B live on half-resolution subgrids; correction is a
radial rescale of each subgrid sampled with bilinear map_coordinates.
Auto mode estimates the radial coefficient per channel by a least-squares
match of block-wise shift estimates (gradient correlation of the channel
difference against the G gradient) against the radial model — a global
radial fit rather than the reference's tile polynomial surface (noted
deviation; the dominant lateral-CA term is radial).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from art_tpu.core.image import bayer_color_index


def _subgrid_offsets(pattern, color):
    """(row0, col0) of the `color` subgrid in the 2x2 pattern."""
    cidx = bayer_color_index(pattern, (2, 2))
    pos = np.argwhere(cidx == color)
    return int(pos[0][0]), int(pos[0][1])


def _estimate_radial(sub_c, sub_g, n_blocks=8):
    """LS estimate of radial scale coefficient: shift(r) = c * r.

    Per block: d = argmin |C(x+d) - G|^2 ~ sum(diff * grad) / sum(grad^2)
    along each axis; project onto the radial direction; fit c.
    """
    h, w = sub_c.shape
    gy, gx = jnp.gradient(sub_g)
    diff = sub_c - sub_g
    num_x = diff * gx
    num_y = diff * gy
    den_x = gx * gx
    den_y = gy * gy

    bh = h // n_blocks
    bw = w // n_blocks

    def block_sum(a):
        a = a[: bh * n_blocks, : bw * n_blocks]
        return a.reshape(n_blocks, bh, n_blocks, bw).sum(axis=(1, 3))

    dx = -block_sum(num_x) / (block_sum(den_x) + 1e-3)
    dy = -block_sum(num_y) / (block_sum(den_y) + 1e-3)
    # block centers in centered coords
    cy = (jnp.arange(n_blocks) + 0.5) * bh - h / 2.0
    cx = (jnp.arange(n_blocks) + 0.5) * bw - w / 2.0
    yy = cy[:, None] * jnp.ones((1, n_blocks))
    xx = cx[None, :] * jnp.ones((n_blocks, 1))
    # radial model: dx = c*x, dy = c*y -> c = sum(dx*x + dy*y)/sum(x^2+y^2)
    wgt = block_sum(den_x) + block_sum(den_y)
    wgt = wgt / (jnp.sum(wgt) + 1e-9)
    c = jnp.sum(wgt * (dx * xx + dy * yy)) / jnp.maximum(
        jnp.sum(wgt * (xx * xx + yy * yy)), 1e-9)
    return jnp.clip(c, -0.01, 0.01)


def _resample_radial(sub, scale):
    h, w = sub.shape
    yc = (h - 1) / 2.0
    xc = (w - 1) / 2.0
    yy = jnp.arange(h, dtype=sub.dtype)[:, None] * jnp.ones((1, w), sub.dtype)
    xx = jnp.arange(w, dtype=sub.dtype)[None, :] * jnp.ones((h, 1), sub.dtype)
    sy = (yy - yc) * (1.0 + scale) + yc
    sx = (xx - xc) * (1.0 + scale) + xc
    return map_coordinates(sub, [sy, sx], order=1, mode="nearest")


def ca_correct(cfa, pattern, auto=True, ca_red=0.0, ca_blue=0.0):
    """Correct lateral CA on the scaled mosaic. Returns corrected mosaic."""
    h, w = cfa.shape
    ry, rx = _subgrid_offsets(pattern, 0)
    by, bx = _subgrid_offsets(pattern, 2)
    g1y, g1x = _subgrid_offsets(pattern, 1)

    sub_r = cfa[ry::2, rx::2]
    sub_b = cfa[by::2, bx::2]
    # G reference on the R subgrid positions: average of H/V G neighbors
    gplane = jnp.pad(cfa, 1, mode="reflect")

    def g_at(y0, x0):
        left = gplane[1 + y0 : 1 + y0 + h : 2, x0 : x0 + w : 2]
        right = gplane[1 + y0 : 1 + y0 + h : 2, 2 + x0 : 2 + x0 + w : 2]
        up = gplane[y0 : y0 + h : 2, 1 + x0 : 1 + x0 + w : 2]
        down = gplane[2 + y0 : 2 + y0 + h : 2, 1 + x0 : 1 + x0 + w : 2]
        return 0.25 * (left + right + up + down)

    g_r = g_at(ry, rx)
    g_b = g_at(by, bx)

    if auto:
        scale_r = _estimate_radial(sub_r, g_r)
        scale_b = _estimate_radial(sub_b, g_b)
    else:
        scale_r = jnp.float32(ca_red * 1e-3)
        scale_b = jnp.float32(ca_blue * 1e-3)

    new_r = _resample_radial(sub_r, scale_r)
    new_b = _resample_radial(sub_b, scale_b)

    out = cfa
    out = out.at[ry::2, rx::2].set(new_r)
    out = out.at[by::2, bx::2].set(new_b)
    return out
