"""Raw chromatic aberration correction (reference: CA_correct_RT.cc:122).

The reference estimates per-tile (ts=128) shifts of R/B relative to G on
the Bayer mosaic, 3x3-median-filters the block shifts, fits a
16-coefficient bivariate polynomial surface per (channel, direction)
(polyord=4, CA_correct_RT.cc:746-836), and resamples the R/B subplanes
by the fitted shift field. Manual mode applies user radial coefficients.

TPU formulation: R and B live on half-resolution subgrids. Auto mode
mirrors the reference: block shifts by gradient correlation, 3x3 median,
weighted least-squares fit of a 4x4 Legendre-basis surface (the
orthogonal basis keeps the f32 on-device solve well-conditioned), then a
two-pass variable-shift bilinear warp built from masked rolls (a 24MP
map_coordinates gather costs ~1.1s on v5e; the masked-roll warp is
bandwidth-bound). Manual mode stays the axis-separable radial rescale
(two MXU matmuls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core.image import bayer_color_index

SHIFT_MAX = 4.0  # px on the subgrid (reference bounds block shifts too)


def _subgrid_offsets(pattern, color):
    """(row0, col0) of the `color` subgrid in the 2x2 pattern."""
    cidx = bayer_color_index(pattern, (2, 2))
    pos = np.argwhere(cidx == color)
    return int(pos[0][0]), int(pos[0][1])


def _subgrid(x, r0, c0):
    from art_tpu.core.image import subgrid2

    return subgrid2(x, r0, c0)


def _upsample(sub, h, w, r0, c0):
    from art_tpu.core.image import subgrid2_scatter

    return subgrid2_scatter(sub, (h, w), r0, c0)


def _legendre_terms(yn, xn, pairs):
    """Products P_i(yn) P_j(xn) for (i, j) in `pairs`, [-1, 1] coords."""

    def P(t):
        return (jnp.ones_like(t), t, 1.5 * t * t - 0.5,
                2.5 * t * t * t - 1.5 * t)

    py = P(yn)
    px = P(xn)
    return [py[i] * px[j] for i, j in pairs]


def _term_pairs(n_blocks):
    """Basis size by block count: the full 4x4 reference surface needs
    enough tiles; small frames degrade to affine/quadratic fits."""
    if n_blocks >= 48:
        return [(i, j) for i in range(4) for j in range(4)]
    if n_blocks >= 12:
        return [(i, j) for i in range(3) for j in range(3) if i + j <= 2]
    return [(0, 0), (0, 1), (1, 0)]


def _block_shifts(sub_c, sub_g, bs=64):
    """Per-block (dy, dx, weight) via gradient correlation.

    Block size mirrors the reference's ts=128 mosaic tiles (64 on the
    subgrid). d = argmin |C(x+d) - G|^2 ~ -sum(diff*grad)/sum(grad^2).
    """
    h, w = sub_c.shape
    nby = max(h // bs, 2)
    nbx = max(w // bs, 2)
    gy, gx = jnp.gradient(sub_g)
    diff = sub_c - sub_g
    num_x = diff * gx
    num_y = diff * gy
    den_x = gx * gx
    den_y = gy * gy
    bh = h // nby
    bw = w // nbx

    def block_sum(a):
        a = a[: bh * nby, : bw * nbx]
        return a.reshape(nby, bh, nbx, bw).sum(axis=(1, 3))

    dx = -block_sum(num_x) / (block_sum(den_x) + 1e-3)
    dy = -block_sum(num_y) / (block_sum(den_y) + 1e-3)
    dx = jnp.clip(dx, -SHIFT_MAX, SHIFT_MAX)
    dy = jnp.clip(dy, -SHIFT_MAX, SHIFT_MAX)
    wgt = block_sum(den_x) + block_sum(den_y)
    return dy, dx, wgt, (nby, nbx, bh, bw)


def _estimate_radial(sub_c, sub_g, n_blocks=8):
    """Global radial coefficient (shift = c * r) — the small-frame
    fallback where 64px tiles don't exist: one pooled parameter averages
    the per-block estimator noise that a free surface fit would absorb."""
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
    cy = (jnp.arange(n_blocks) + 0.5) * bh - h / 2.0
    cx = (jnp.arange(n_blocks) + 0.5) * bw - w / 2.0
    yy = cy[:, None] * jnp.ones((1, n_blocks))
    xx = cx[None, :] * jnp.ones((n_blocks, 1))
    wgt = block_sum(den_x) + block_sum(den_y)
    wgt = wgt / (jnp.sum(wgt) + 1e-9)
    c = jnp.sum(wgt * (dx * xx + dy * yy)) / jnp.maximum(
        jnp.sum(wgt * (xx * xx + yy * yy)), 1e-9)
    return jnp.clip(c, -0.01, 0.01)


def _median3x3(a):
    """3x3 median over a small 2D block grid (edge-replicated), the
    reference's robustness filter on blockshifts (:760-775)."""
    ap = jnp.pad(a, 1, mode="edge")
    vs = [ap[1 + dy : 1 + dy + a.shape[0], 1 + dx : 1 + dx + a.shape[1]]
          for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    st = jnp.stack(vs)
    return jnp.median(st, axis=0)


def _fit_surface(dy, dx, wgt, geom, shape):
    """Weighted LS fit of the 16-term surface; returns full-resolution
    (sy, sx) shift fields for the subgrid."""
    nby, nbx, bh, bw = geom
    h, w = shape
    dy = _median3x3(dy)
    dx = _median3x3(dx)
    pairs = _term_pairs(nby * nbx)
    # block centers in [-1, 1]
    cy = ((jnp.arange(nby) + 0.5) * bh) / h * 2.0 - 1.0
    cx = ((jnp.arange(nbx) + 0.5) * bw) / w * 2.0 - 1.0
    yn = jnp.repeat(cy, nbx)
    xn = jnp.tile(cx, nby)
    A = jnp.stack(_legendre_terms(yn, xn, pairs), axis=1)
    wn = wgt.reshape(-1) / (jnp.sum(wgt) + 1e-9) + 1e-12
    # ridge-regularized normal equations: the near-orthogonal Legendre
    # basis keeps them well-conditioned in f32 (vs an SVD lstsq, whose
    # TPU/CPU compile dominates plan latency)
    AtW = A.T * wn[None, :]
    G = AtW @ A + 1e-6 * jnp.eye(A.shape[1], dtype=A.dtype)
    coeff_y = jnp.linalg.solve(G, AtW @ dy.reshape(-1))
    coeff_x = jnp.linalg.solve(G, AtW @ dx.reshape(-1))

    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    terms = _legendre_terms(yy[:, None], xx[None, :], pairs)
    sy = sum(c * t for c, t in zip(coeff_y, terms))
    sx = sum(c * t for c, t in zip(coeff_x, terms))
    return (jnp.clip(sy, -SHIFT_MAX, SHIFT_MAX),
            jnp.clip(sx, -SHIFT_MAX, SHIFT_MAX))


def _warp_axis(a, shift, axis, dmax=int(SHIFT_MAX)):
    """out(p) = a(p + shift(p)) along `axis`, bilinear, |shift|<=dmax.

    Bilinear resampling at fractional offset s is the tent-weighted sum
    over integer taps: out = sum_d max(0, 1-|s-d|) * a(p+d) — pure VPU
    FMA over shifted planes, no masks/selects. Taps come from an
    edge-replicated pad (static slices), so border pixels stay local
    instead of wrapping to the opposite edge (the reference
    excludes/clamps borders, CA_correct_RT.cc)."""
    pad = dmax + 1
    pw = [(0, 0)] * a.ndim
    pw[axis] = (pad, pad)
    ap = jnp.pad(a, pw, mode="edge")
    shift = jnp.clip(shift, -dmax, dmax - 1e-3)
    out = jnp.zeros_like(a)
    sl = [slice(None)] * a.ndim
    for d in range(-dmax, dmax + 2):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(shift - d))
        sl[axis] = slice(pad + d, pad + d + a.shape[axis])
        out = out + w * ap[tuple(sl)]
    return out


def _warp2d(sub, sy, sx):
    """Two-pass spatially-varying bilinear warp (the cross term
    sy * d(sx)/dy is second-order in the smooth CA field)."""
    tmp = _warp_axis(sub, sy, 0)
    return _warp_axis(tmp, sx, 1)


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

    # subgrid extraction as exact one-hot matmuls on the MXU: every
    # relayout form of the stride-2 subsample (strided slice 75ms,
    # reshape-view index 35ms, transpose 30ms, one-hot einsum 30ms at
    # 24MP, all measured r5 on v5e) lowers to a slow path; a selection
    # matmul at precision="highest" runs in ~7ms and is bit-exact (each
    # output sums exactly one f32 product by 1.0).
    sub_r = _subgrid(cfa, ry, rx)
    sub_b = _subgrid(cfa, by, bx)
    # G reference at R/B positions: full-plane cardinal average (rolls),
    # then the same matmul subsample
    gavg = 0.25 * (jnp.roll(cfa, 1, axis=1) + jnp.roll(cfa, -1, axis=1)
                   + jnp.roll(cfa, 1, axis=0) + jnp.roll(cfa, -1, axis=0))
    g_r = _subgrid(gavg, ry, rx)
    g_b = _subgrid(gavg, by, bx)

    if auto and min(sub_r.shape) >= 256:
        # reference-style per-tile surface (needs enough 64px tiles to
        # average the block-estimator noise)
        sy_r, sx_r = _fit_surface(*_block_shifts(sub_r, g_r),
                                  shape=sub_r.shape)
        sy_b, sx_b = _fit_surface(*_block_shifts(sub_b, g_b),
                                  shape=sub_b.shape)
        new_r = _warp2d(sub_r, sy_r, sx_r)
        new_b = _warp2d(sub_b, sy_b, sx_b)
    elif auto:
        new_r = _resample_radial(sub_r, _estimate_radial(sub_r, g_r))
        new_b = _resample_radial(sub_b, _estimate_radial(sub_b, g_b))
    else:
        new_r = _resample_radial(sub_r, jnp.float32(ca_red * 1e-3))
        new_b = _resample_radial(sub_b, jnp.float32(ca_blue * 1e-3))

    # interleave back: transposed selection matmuls scatter the new
    # subplanes to their sites; parity masks keep everything else
    rp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2
    cp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2
    m_r = (rp == ry) & (cp == rx)
    m_b = (rp == by) & (cp == bx)
    keep = jnp.where(m_r | m_b, 0.0, 1.0)
    return (cfa * keep + _upsample(new_r, h, w, ry, rx)
            + _upsample(new_b, h, w, by, bx))
