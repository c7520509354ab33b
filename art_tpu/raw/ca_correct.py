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


def _axis_matrix(n, scale, dtype):
    """Bilinear 1-D resample matrix M with M[i, j] = w(src_i - j),
    src_i = (i - c)(1 + scale) + c — the radial scale is axis-separable,
    so the resample becomes two MXU matmuls instead of a 24MP
    map_coordinates gather (~1.1s at 24MP on v5e)."""
    c = (n - 1) / 2.0
    i = jnp.arange(n, dtype=dtype)
    src = (i - c) * (1.0 + scale) + c
    src = jnp.clip(src, 0.0, n - 1.0)
    j = jnp.arange(n, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def _resample_radial(sub, scale):
    h, w = sub.shape
    ry = _axis_matrix(h, scale, sub.dtype)
    cx = _axis_matrix(w, scale, sub.dtype)
    tmp = jnp.dot(ry, sub, precision="highest")
    return jnp.dot(tmp, cx.T, precision="highest")


def ca_correct(cfa, pattern, auto=True, ca_red=0.0, ca_blue=0.0):
    """Correct lateral CA on the scaled mosaic. Returns corrected mosaic."""
    h, w = cfa.shape
    ry, rx = _subgrid_offsets(pattern, 0)
    by, bx = _subgrid_offsets(pattern, 2)
    g1y, g1x = _subgrid_offsets(pattern, 1)

    # subgrid extraction through a (H/2, 2, W/2, 2) view: stride-2 24MP
    # slices cost ~50ms each on TPU, static small-dim indexing is free
    view = cfa.reshape(h // 2, 2, w // 2, 2)
    sub_r = view[:, ry, :, rx]
    sub_b = view[:, by, :, bx]
    # G reference at R/B positions: full-plane cardinal average (rolls),
    # then the same cheap subsample
    gavg = 0.25 * (jnp.roll(cfa, 1, axis=1) + jnp.roll(cfa, -1, axis=1)
                   + jnp.roll(cfa, 1, axis=0) + jnp.roll(cfa, -1, axis=0))
    gview = gavg.reshape(h // 2, 2, w // 2, 2)
    g_r = gview[:, ry, :, rx]
    g_b = gview[:, by, :, bx]

    if auto:
        scale_r = _estimate_radial(sub_r, g_r)
        scale_b = _estimate_radial(sub_b, g_b)
    else:
        scale_r = jnp.float32(ca_red * 1e-3)
        scale_b = jnp.float32(ca_blue * 1e-3)

    new_r = _resample_radial(sub_r, scale_r)
    new_b = _resample_radial(sub_b, scale_b)

    # interleave through a (H/2, 2, W/2, 2) view: strided 24MP scatters
    # (.at[::2, ::2].set) lower to the slow scatter path on TPU
    v = cfa.reshape(h // 2, 2, w // 2, 2)
    v = v.at[:, ry, :, rx].set(new_r)
    v = v.at[:, by, :, bx].set(new_b)
    return v.reshape(h, w)
