"""Dynamic range compression — Fattal'02 gradient-domain TMO.

Reference: ``rtengine/tmo_fattal02.cc`` (LuminanceHDR lineage, RT-tuned:
fixed 7-level pyramid, 1920px dimension cap for the attenuation matrix,
median prefilter on deep shadows, median-matched output rescale).

TPU formulation: pyramid = blur+decimate chain (static shapes), the FFT
Poisson solve uses an even-symmetric extension + rfft2 (equivalent to the
reference's DCT-based Neumann solver), and the median statistics run on a
200px nearest downsample with jnp.sort on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs

NLEVELS = 7
DETAIL_LEVEL = 3
DIM_CAP = 1920


def plan(pp, ctx):
    f = pp.fattal
    if not f.enabled:
        return None
    alpha = 1.0
    if f.threshold < 0:
        alpha += f.threshold * 0.9 / 100.0
    elif f.threshold > 0:
        alpha += f.threshold / 100.0
    beta = 1.0 - (f.amount * 0.3) / 100.0
    if alpha <= 0 or beta <= 0:
        return None
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    data = {
        "lum_w": lum_w.astype(np.float32),
        "alpha": np.float32(alpha),
        "beta": np.float32(beta),
        "noise": np.float32(alpha * 0.01),
    }
    return (), data


# median stencils by image size (Median_Denoise call,
# tmo_fattal02.cc:1104-1116: r = max(w,h)/1920 picks 3x3 strong /
# 5x5 soft (13-pt diamond) / 5x5 strong / 7x7)
_MED_3X3 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_MED_5X5_SOFT = [(-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
                 (0, 0), (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0)]
_MED_5X5 = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]
_MED_7X7 = [(dy, dx) for dy in range(-3, 4) for dx in range(-3, 4)]


def _median_pts(x, pts):
    r = max(max(abs(dy), abs(dx)) for dy, dx in pts)
    p = jnp.pad(x, r, mode="edge")
    h, w = x.shape
    vals = jnp.stack([p[r + dy : r + dy + h, r + dx : r + dx + w]
                      for dy, dx in pts])
    return jnp.median(vals, axis=0)


def _median3(x):
    return _median_pts(x, _MED_3X3)


def _blur5(x):
    # the reference's pyramid blur (gaussianBlur in tmo_fattal02.cc:178,
    # 5-tap [1 4 6 4 1]/16 separable)
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    h, w = x.shape
    p = jnp.pad(x, ((2, 2), (0, 0)), mode="edge")
    col = sum(p[i : i + h] * k[i] for i in range(5))
    p2 = jnp.pad(col, ((0, 0), (2, 2)), mode="edge")
    return sum(p2[:, i : i + w] * k[i] for i in range(5))


def _gradients(hh, k):
    divider = 2.0 ** (k + 1)
    p = jnp.pad(hh, 1, mode="edge")
    h, w = hh.shape
    gx = p[1 : 1 + h, 0:w] - p[1 : 1 + h, 2 : 2 + w]
    gy = p[2 : 2 + h, 1 : 1 + w] - p[0:h, 1 : 1 + w]
    g = jnp.sqrt(gx * gx + gy * gy) / divider
    return g, jnp.mean(g)


def _poisson_neumann(f):
    """Solve lap(U) = f with Neumann BC via even-symmetric rfft2."""
    h, w = f.shape
    ext = jnp.concatenate([f, f[::-1]], axis=0)
    ext = jnp.concatenate([ext, ext[:, ::-1]], axis=1)
    F = jnp.fft.rfft2(ext)
    ky = jnp.arange(2 * h)
    kx = jnp.arange(F.shape[1])
    eig = (2.0 * jnp.cos(jnp.pi * ky / h)[:, None]
           + 2.0 * jnp.cos(jnp.pi * kx / w)[None, :] - 4.0)
    eig = eig.at[0, 0].set(1.0)
    U = F / eig
    U = U.at[0, 0].set(0.0)
    u = jnp.fft.irfft2(U, s=ext.shape)
    return u[:h, :w]


def apply(rgb, data, static):
    lw = data["lum_w"]
    h, w = rgb.shape[1:]
    y = jnp.maximum(lw[0] * rgb[0] + lw[1] * rgb[1] + lw[2] * rgb[2], 1.0)

    # median prefilter on deep shadows (luminance_noise_floor = 65.535);
    # the stencil grows with image size (tmo_fattal02.cc:1104-1116)
    r_cap = max(h, w) / float(DIM_CAP)
    pts = (_MED_7X7 if r_cap >= 3 else
           _MED_5X5 if r_cap >= 2 else
           _MED_5X5_SOFT if r_cap >= 1 else _MED_3X3)
    y = jnp.where(y < 65.535, _median_pts(y, pts), y)

    hh = jnp.log(y + 1e-4)

    # downscale for FI when above the dimension cap
    dim = max(h, w)
    ds = max(1, int(np.ceil(dim / DIM_CAP)))
    from art_tpu.core.image import subsample_mm

    hs = subsample_mm(hh, ds, ds)

    # pyramid + gradients
    pyr = [hs]
    for k in range(1, NLEVELS):
        if min(pyr[-1].shape) < 8:
            break
        pyr.append(_blur5(pyr[-1])[::2, ::2])
    grads = []
    for k, p in enumerate(pyr):
        grads.append(_gradients(p, k))

    # FI attenuation (calculateFiMatrix)
    nl = len(pyr)
    fi = jnp.ones_like(pyr[-1])
    alpha = data["alpha"]
    beta = data["beta"]
    noise = data["noise"]
    for k in range(nl - 1, -1, -1):
        g, avg = grads[k]
        if k >= DETAIL_LEVEL or k == nl - 1:
            a = alpha * avg
            grad = jnp.maximum(g, 1e-4)
            fi = fi * jnp.power((grad + noise) / jnp.maximum(a, 1e-9),
                                beta - 1.0)
        if k > 0:
            th, tw = pyr[k - 1].shape
            fi = jnp.repeat(jnp.repeat(fi, 2, 0), 2, 1)[:th, :tw]
            fi = _blur5(fi)

    if ds > 1:
        fi = jnp.repeat(jnp.repeat(fi, ds, 0), ds, 1)[:h, :w]

    # attenuated gradients + divergence (forward diffs, reflective +1)
    hp = jnp.concatenate([hh, hh[-2:-1]], axis=0)
    gx = (jnp.concatenate([hh[:, 1:], hh[:, -2:-1]], axis=1) - hh) * 0.5 * (
        jnp.concatenate([fi[:, 1:], fi[:, -2:-1]], axis=1) + fi)
    gy = (jnp.concatenate([hh[1:], hh[-2:-1]], axis=0) - hh) * 0.5 * (
        jnp.concatenate([fi[1:], fi[-2:-1]], axis=0) + fi)
    div = gx + gy
    div = div - jnp.concatenate([-gx[:, :1], gx[:, :-1]], axis=1)
    div = div - jnp.concatenate([-gy[:1], gy[:-1]], axis=0)

    u = _poisson_neumann(div)
    l = jnp.exp(u)

    # median-matched rescale (statistics on ~200px nearest downsample)
    sy = max(1, h // 200)
    sx = max(1, w // 200)
    y_small = jnp.sort(subsample_mm(y, sy, sx).reshape(-1))
    l_small = jnp.sort(subsample_mm(l, sy, sx).reshape(-1))
    n = y_small.shape[0]
    old_med = y_small[n // 2]
    new_med = l_small[n // 2]
    scale = jnp.where((old_med > 0) & (new_med > 0), old_med / new_med,
                      65535.0)

    ratio = jnp.maximum(l, 1e-4) * scale / jnp.maximum(y, 1e-4)
    return rgb * ratio[None]
