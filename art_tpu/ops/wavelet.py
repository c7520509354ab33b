"""Undecimated (à trous) wavelet decomposition.

Reference: ``rtengine/cplx_wavelet_dec.{h,cc}`` — RT's denoise uses an
undecimated separable wavelet (Daubechies-4 family) with per-level
shrinkage. On TPU each level is a pair of separable dilated convolutions
(shift-and-add with 2^level spacing); subbands stay full-resolution, which
is exactly the reference's memory layout and keeps everything fusible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# RT's 4-tap Daubechies analysis filter (cplx_wavelet_filter_coeffs.h)
_DAUB4 = np.array([0.230377813309, 0.714846570553, 0.630880767930,
                   -0.027983769417], dtype=np.float32)
# B3-spline kernel — classic à trous choice, used for the smoothing variant
_B3 = np.array([1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16], dtype=np.float32)


def _sep_blur(x, kernel, spacing):
    """Separable convolution with dilated taps (reflect borders)."""
    k = len(kernel)
    r = (k - 1) // 2 * spacing

    def conv_axis(a, axis):
        p = jnp.pad(a, [(r, r) if i == axis else (0, 0)
                        for i in range(a.ndim)], mode="reflect")
        out = None
        for i, w in enumerate(kernel):
            off = i * spacing
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(off, off + a.shape[axis])
            piece = p[tuple(sl)] * w
            out = piece if out is None else out + piece
        return out

    return conv_axis(conv_axis(x, 0), 1)


def atrous_decompose(x, levels):
    """x -> ([detail_0..detail_{n-1}], residual) with B3 à trous."""
    details = []
    cur = x
    for lv in range(levels):
        smooth = _sep_blur(cur, _B3, 2 ** lv)
        details.append(cur - smooth)
        cur = smooth
    return details, cur


def atrous_reconstruct(details, residual):
    out = residual
    for d in details:
        out = out + d
    return out


def mad_sigma(detail):
    """Noise sigma estimate: median absolute deviation of the finest level
    (the reference's Mad()/MadMax per-tile statistic, whole-plane here).

    Subsampled 8x per axis, and the median found by 24 bisection passes
    (count-below halving) instead of a sort: TPU sorts are bitonic and
    slow (~1ms per 16k plane); the bisection converges to max/2^24 —
    far below the estimator's own sampling noise — in fused reduces."""
    sub = jnp.abs(detail[::8, ::8] if detail.ndim == 2 else detail)
    lo = jnp.zeros((), sub.dtype)
    hi = jnp.max(sub)
    n = sub.size

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        below = jnp.sum((sub <= mid).astype(jnp.float32))
        upper = below >= 0.5 * n
        return jnp.where(upper, lo, mid), jnp.where(upper, mid, hi)

    import jax.lax as lax

    lo, hi = lax.fori_loop(0, 24, body, (lo, hi))
    return 0.5 * (lo + hi) / 0.6745


def soft_threshold(d, t):
    return jnp.sign(d) * jnp.maximum(jnp.abs(d) - t, 0.0)


def shrink_sure_like(d, sigma, strength):
    """RT-style smooth shrinkage: attenuation by local energy vs noise
    (WaveletDenoiseAll's per-coefficient factor sqr(mad)/ (sqr(mad) +
    local_var) form), with `strength` scaling the assumed noise."""
    t2 = (strength * sigma) ** 2
    # local coefficient energy (3x3 mean of squares)
    p = jnp.pad(d * d, 1, mode="reflect")
    h, w = d.shape
    e = jnp.zeros_like(d)
    for dy in range(3):
        for dx in range(3):
            e = e + p[dy : dy + h, dx : dx + w]
    e = e / 9.0
    factor = e / (e + t2 + 1e-12)
    return d * factor
