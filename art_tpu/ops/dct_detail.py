"""Block-DCT luminance detail recovery (reference: FTblockDN.cc:1479
``detail_recovery``).

After the wavelet shrinkage pass, the reference decomposes the luminance
*residual* (input minus denoised) into overlapping 64x64 tiles, DCTs each
tile, attenuates coefficients by ``1 - exp(-nbrwt^2 / noisevar)`` where
``nbrwt`` is a box blur of the absolute DCT coefficients
(RGBtile_denoise, FTblockDN.cc:494) and ``noisevar`` encodes the user's
Luminance Detail slider (``compute_detail``, FTblockDN.cc:1482), then
inverse-DCTs and overlap-adds with a sin^2 window (FTblockDN.cc:1828-1845).
The surviving residual is added back to the denoised plane: structured
detail the wavelet killed returns, unstructured noise stays suppressed.

TPU formulation: the reference shifts tiles by ``offset=25``; we shift by
``TS/2 = 32`` so the overlapping tiling decomposes into four non-overlapping
64-aligned reshapes (no gathers), each pixel covered by exactly 4 tiles.
The DCT itself is two 64x64 matmuls per tile - MXU-native - using the
FFTW REDFT10/REDFT01 scaling so ``noisevar``'s absolute calibration matches
the reference. The combining weight ``totwt`` becomes a constant 32x32
periodic plane, precomputed on the host.

The optional detail-threshold mask (``detail_mask``, FTblockDN.cc:1408)
modulates the Detail slider per pixel from a log-domain Laplacian of L.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.ops.filters import gauss_blur

TS = 64
STRIDE = 32  # reference uses offset=25; see module docstring
_SHIFTS = ((0, 0), (0, STRIDE), (STRIDE, 0), (STRIDE, STRIDE))
_LSCALE = 65535.0  # reference labdn->L scale inside RGB_denoise


def _tilemasks():
    """sin^2 edge windows (FTblockDN.cc:1831-1845), with epsilon floor."""
    border = max(2, TS // 16)
    eps = 0.001 / (TS * TS)
    i = np.arange(TS, dtype=np.float64)
    i1 = np.where(i > TS / 2, np.abs(i - TS + 1), i)
    m_in = np.where(i1 < border,
                    np.sin((np.pi * i1) / (2 * border)) ** 2, 1.0)
    m_out = np.where(i1 < 2 * border,
                     np.sin((np.pi * i1) / (2 * border)) ** 2, 1.0)
    w_in = (m_in[:, None] * m_in[None, :] + eps).astype(np.float32)
    w_out = (m_out[:, None] * m_out[None, :] + eps).astype(np.float32)
    return w_in, w_out


_W_IN, _W_OUT = _tilemasks()


def _totwt_pattern():
    """Combining weight: sum of w_in*w_out over the 4 covering shifts.

    Periodic with period STRIDE in both axes (every pixel sees the same
    four window quadrants), so a single STRIDE x STRIDE tile suffices."""
    prod = _W_IN * _W_OUT
    pat = (prod[:STRIDE, :STRIDE] + prod[STRIDE:, :STRIDE]
           + prod[:STRIDE, STRIDE:] + prod[STRIDE:, STRIDE:])
    return pat.astype(np.float32)


_TOTWT = _totwt_pattern()


def _dct_mats():
    """FFTW-scaled DCT-II forward / DCT-III inverse matrices.

    REDFT10: X_k = 2 sum_n x_n cos(pi (n+1/2) k / N)
    REDFT01: y_n = X_0 + 2 sum_{k>=1} X_k cos(pi k (n+1/2) / N)
    The product is 2N per axis; the reference divides by 4*TS*TS
    (DCTnorm, FTblockDN.cc:537) which we fold into the inverse as
    1/(2*TS) per axis."""
    n = np.arange(TS, dtype=np.float64)
    k = np.arange(TS, dtype=np.float64)
    fwd = 2.0 * np.cos(np.pi * (n[None, :] + 0.5) * k[:, None] / TS)
    scale = np.where(k == 0, 1.0, 2.0)
    inv = scale[None, :] * np.cos(np.pi * k[None, :] * (n[:, None] + 0.5) / TS)
    inv /= 2.0 * TS
    return fwd.astype(np.float32), inv.astype(np.float32)


_DCT_F, _DCT_I = _dct_mats()


def compute_detail(d):
    """noisevar_Ldetail from the Detail slider (FTblockDN.cc:1482-1486)."""
    t = 100.0 - d
    return ((t * t + 50.0 * t) * (TS * 0.5)) ** 2


def _box_abs_blur_tiles(x, rad):
    """Per-tile box blur of |x| with edge-shrinking windows
    (boxabsblur, boxblur.h:745). x: (N, TS, TS)."""
    a = jnp.abs(x)
    ones = jnp.ones((1, TS, TS), a.dtype)

    def blur1d(v, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (rad, rad)
        vp = jnp.pad(v, pad)
        c = jnp.cumsum(vp, axis=axis)
        zero = jnp.zeros_like(jnp.take(c, jnp.arange(1), axis=axis))
        c = jnp.concatenate([zero, c], axis=axis)
        hi = jnp.take(c, jnp.arange(2 * rad + 1, TS + 2 * rad + 1),
                      axis=axis)
        lo = jnp.take(c, jnp.arange(0, TS), axis=axis)
        return hi - lo

    num = blur1d(blur1d(a, 1), 2)
    den = blur1d(blur1d(ones, 1), 2)
    return num / den


def _tile_groups(xp):
    """Decompose a padded plane into the 4 shifted non-overlapping tilings.

    Yields (dy, dx, tiles) with tiles shaped (nh*nw, TS, TS)."""
    Hp, Wp = xp.shape
    for dy, dx in _SHIFTS:
        h = Hp - (TS if dy else 0)
        w = Wp - (TS if dx else 0)
        sub = xp[dy:dy + h, dx:dx + w]
        nh, nw = h // TS, w // TS
        tiles = sub.reshape(nh, TS, nw, TS).transpose(0, 2, 1, 3)
        yield dy, dx, tiles.reshape(nh * nw, TS, TS), (nh, nw, h, w)


def detail_mask(L, amount, scale=1.0):
    """Per-pixel Detail modulation mask (detail_mask, FTblockDN.cc:1408).

    L is the 0..1 gamma-domain luminance; amount = threshold/100."""
    H, W = L.shape
    if H < 8 or W < 8:
        return jnp.ones_like(L)
    h4, w4 = H // 4, W // 4
    # bilinear 4x downscale (rescaleBilinear role)
    import jax.image as jimage

    L2 = jimage.resize(L, (h4, w4), method="linear")
    base = 50.0
    L2 = jnp.log(jnp.maximum(L2, 0.0) * (base - 1.0) + 1.0) / np.log(base)
    # 8-neighbor laplacian with edge reflection (laplacian, FTblockDN.cc:1366)
    p = jnp.pad(L2, 1, mode="reflect", reflect_type="even")
    p = jnp.maximum(p, 0.0)
    lap = (-8.0 * p[1:-1, 1:-1] + p[:-2, 1:-1] + p[2:, 1:-1]
           + p[1:-1, :-2] + p[1:-1, 2:] + p[:-2, :-2] + p[:-2, 2:]
           + p[2:, :-2] + p[2:, 2:])
    thr = 25.0 / _LSCALE
    ceil = 10000.0 / _LSCALE
    m2 = jnp.clip(jnp.abs(lap) - thr, 0.0, ceil) * (amount / ceil)
    mask = jimage.resize(m2, (H, W), method="linear")
    # scurve: lin2log(x^2.23, 101) (FTblockDN.cc:1431-1437)
    x = jnp.clip(mask + (1.0 - amount), 0.0, 1.0)
    mask = jnp.log(x ** 2.23 * 100.0 + 1.0) / np.log(101.0)
    return gauss_blur(mask, 25.0 / scale)


def dct_detail_recovery(y_in, y_dn, lum_detail, detail_thresh=0,
                        scale=1.0):
    """Add DCT-filtered residual detail back to the denoised luminance.

    y_in / y_dn: 0..1 gamma-domain luminance before/after wavelet
    shrinkage. lum_detail: the Luminance Detail slider 0..100.
    Returns the corrected denoised plane."""
    H, W = y_in.shape
    params_ld = jnp.minimum(jnp.asarray(lum_detail, jnp.float32), 99.9)

    resid = (y_in - y_dn) * _LSCALE
    # pad: >= STRIDE margin each side, total multiple of TS
    Hp = int(np.ceil((H + 2 * STRIDE) / TS) * TS)
    Wp = int(np.ceil((W + 2 * STRIDE) / TS) * TS)
    pt, pl = STRIDE, STRIDE
    pb, pr = Hp - H - pt, Wp - W - pl
    rp = jnp.pad(resid, ((pt, pb), (pl, pr)), mode="reflect")

    # per-pixel Detail value -> noisevar plane (spatial indexing quirk of
    # the reference: detail_factor is filled per input pixel but consumed
    # at the same flat index in the frequency domain - replicated here)
    if detail_thresh > 0:
        amount = float(np.clip(detail_thresh / 100.0, 0.0, 1.0))
        dmask = detail_mask(y_dn, amount, scale)
        dplane = params_ld * dmask
    else:
        dplane = jnp.full((H, W), 1.0, jnp.float32) * params_ld
    # out-of-image positions take detail_lo = compute_detail(0); the zero
    # padding produces exactly that, so no special-casing is needed.
    dp = jnp.pad(dplane, ((pt, pb), (pl, pr)))
    nvp = compute_detail(dp)

    w_in = jnp.asarray(_W_IN)
    w_out = jnp.asarray(_W_OUT)
    Df = jnp.asarray(_DCT_F)
    Di = jnp.asarray(_DCT_I)
    rad = max(1, int(3 / scale))

    acc = jnp.zeros((Hp, Wp), jnp.float32)
    nv_groups = [g for _, _, g, _ in _tile_groups(nvp)]
    for (dy, dx, tiles, (nh, nw, h, w)), nvg in zip(_tile_groups(rp),
                                                    nv_groups):
        t = tiles * w_in[None]
        f = jnp.einsum("ki,nij,lj->nkl", Df, t, Df)
        nbrwt = _box_abs_blur_tiles(f, rad)
        nv = jnp.maximum(nvg, 1e-6)
        f = f * (1.0 - jnp.exp(-(nbrwt * nbrwt) / nv))
        out = jnp.einsum("ik,nkl,jl->nij", Di, f, Di) * w_out[None]
        plane = out.reshape(nh, nw, TS, TS).transpose(0, 2, 1, 3)
        plane = plane.reshape(h, w)
        acc = acc.at[dy:dy + h, dx:dx + w].add(plane)

    totwt = jnp.asarray(np.tile(_TOTWT, (Hp // STRIDE, Wp // STRIDE)))
    detail = (acc / totwt)[pt:pt + H, pl:pl + W]
    return y_dn + detail / _LSCALE
