"""Fast device-side 1-D curves: Chebyshev series or 64-segment cubics.

The reference applies tone curves through 65536-entry LUT gathers
(``LUT.h``). On TPU, gathers from tables >~64 entries hit the slow gather
path (~200 ms per 24MP plane measured on v5e); even 64-entry takes cost
~7 ms per 24MP plane. So the planner refits every curve on the host:

1. preferred: a single Chebyshev series (degree <=31) on the sqrt-warped
   domain, evaluated with Clenshaw recurrence -- pure VPU FMAs, no gather
   at all (~1-2 ms per 24MP plane);
2. fallback for kinky curves (hard clips, posterize): 64 cubic segments
   uniform in sqrt(x), evaluated with 4 small-table takes + Horner.

`eval_curve` dispatches on the representation's rank: (D,) = Chebyshev,
(K, 4) = segments. The sqrt warp concentrates resolution in the shadows
for both forms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.core.image import MAXVAL

K = 64  # segments
CHEB_TOL = 2e-4  # max refit error (of full scale) to accept a series fit


def fit_curve(dense_lut, in_max=1.0, allow_poly=True):
    """Fit a (N,) dense curve (sampled uniformly on [0, in_max]).

    Preferred representation: Chebyshev coefficients (D,) over the
    sqrt-warped domain, if a degree-<=31 series meets CHEB_TOL.
    Fallback: (K, 4) cubic segment coefficients [a, b, c, d] with
    y = ((a*u + b)*u + c)*u + d for local u = t*K - k.
    """
    dense_lut = np.asarray(dense_lut, dtype=np.float64)
    n = dense_lut.shape[0]

    def curve_at(x01):
        # sample the dense LUT with linear interp; x01 in [0,1]
        idx = np.clip(x01, 0.0, 1.0) * (n - 1)
        i0 = np.floor(idx).astype(np.int64)
        i1 = np.minimum(i0 + 1, n - 1)
        fr = idx - i0
        return dense_lut[i0] * (1 - fr) + dense_lut[i1] * fr

    if allow_poly:
        t = np.linspace(0.0, 1.0, 4097)
        y = curve_at(t * t)
        for deg in (15, 23, 31):
            c = np.polynomial.chebyshev.chebfit(2.0 * t - 1.0, y, deg)
            err = np.abs(np.polynomial.chebyshev.chebval(2.0 * t - 1.0, c)
                         - y).max()
            if err < CHEB_TOL:
                return c.astype(np.float32)

    # 4 Chebyshev-like nodes per segment (interpolatory cubic)
    u_nodes = np.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0])
    coeffs = np.zeros((K, 4))
    V = np.vander(u_nodes, 4)  # columns u^3 u^2 u 1
    Vinv = np.linalg.inv(V)
    for k in range(K):
        t = (k + u_nodes) / K  # warped coords
        x01 = t * t  # invert warp: x = t^2
        y = curve_at(x01)
        coeffs[k] = Vinv @ y
    return coeffs.astype(np.float32)


def fit_fn(fn, in_max=1.0, samples=65536):
    x = np.linspace(0.0, 1.0, samples)
    return fit_curve(fn(x), in_max)


def split_poly(fn_t, deg_half, tol=None):
    """Fit fn(t), t in [-1,1], as the even/odd Horner split
    f(t) ~ P(u) + t*Q(u) with u = 2*t^2 - 1, returned as a
    (2, deg_half+1) array [P; Q] (highest power first). Two half-degree
    Horner chains cost half the FMAs of Clenshaw and evaluate more
    accurately in f32 (shorter cancellation chains). The fit runs in the
    Chebyshev basis of u (well-conditioned) and converts the solution to
    monomial form. Returns None if tol is given and the fit misses it."""
    t = np.linspace(-1.0, 1.0, 40001)
    y = np.asarray(fn_t(t), dtype=np.float64)
    fe = 0.5 * (y + y[::-1])
    fo = 0.5 * (y - y[::-1])
    half = t > 0
    u = 2.0 * t[half] ** 2 - 1.0
    a = np.polynomial.chebyshev.chebvander(u, deg_half)
    cp, *_ = np.linalg.lstsq(a, fe[half], rcond=None)
    cq, *_ = np.linalg.lstsq(a, fo[half] / t[half], rcond=None)
    p = np.polynomial.chebyshev.cheb2poly(cp)[::-1]  # highest first
    q = np.polynomial.chebyshev.cheb2poly(cq)[::-1]
    out = np.stack([p, q]).astype(np.float32)
    if tol is not None:
        uu = 2.0 * t * t - 1.0
        approx = (np.polyval(out[0].astype(np.float64), uu)
                  + t * np.polyval(out[1].astype(np.float64), uu))
        if np.abs(approx - y).max() > tol:
            return None
    return out


def fit_gamma_split(gamma):
    """(fwd, inv) split fits for the denoise gamma transfer (plan-time
    scalar gamma): fwd evaluates x^(1/gamma) on the x^(1/8) warp
    (wavelet_pallas.gamma_fwd_eval), inv evaluates x^gamma on the sqrt
    warp (gamma_inv_eval). Replaces jnp.power, which lowers to exp+log
    on the VPU (~8ms per 3-plane 24MP pass)."""
    g = float(gamma)

    def fwd_t(t):  # x = ((t+1)/2)^8
        return np.clip((t + 1.0) / 2.0, 0.0, 1.0) ** (8.0 / g)

    def inv_t(t):  # x = ((t+1)/2)^2
        return np.clip((t + 1.0) / 2.0, 0.0, 1.0) ** (2.0 * g)

    fwd = None
    inv = None
    for dh in (10, 12, 14, 16):
        if fwd is None:
            fwd = split_poly(fwd_t, dh, tol=5e-7)
        if inv is None:
            inv = split_poly(inv_t, dh, tol=5e-7)
    if fwd is None:
        fwd = split_poly(fwd_t, 16)
    if inv is None:
        inv = split_poly(inv_t, 16)
    return fwd, inv


def fit_curve_split(dense_lut, deg_half=(10, 12, 14, 16), tol=CHEB_TOL):
    """Fit a (N,) dense curve (uniform on [0,1]) as an even/odd Horner
    split on the sqrt-warped domain t = 2*sqrt(x)-1 (same warp as
    fit_curve). Returns (2, deg_half+1) or None for kinky curves."""
    dense_lut = np.asarray(dense_lut, dtype=np.float64)
    n = dense_lut.shape[0]

    def fn_t(t):
        x01 = ((t + 1.0) / 2.0) ** 2
        idx = np.clip(x01, 0.0, 1.0) * (n - 1)
        i0 = np.floor(idx).astype(np.int64)
        i1 = np.minimum(i0 + 1, n - 1)
        fr = idx - i0
        return dense_lut[i0] * (1 - fr) + dense_lut[i1] * fr

    if np.isscalar(deg_half):
        deg_half = (deg_half,)
    for dh in deg_half:
        out = split_poly(fn_t, dh, tol=tol)
        if out is not None:
            return out
    return None


def eval_split(x, pq_coeffs, in_max=1.0, out_max=1.0):
    """Evaluate a (2, K) split fit: t = 2*sqrt(x/in_max)-1, Horner in
    u = 2*t^2-1."""
    t = 2.0 * jnp.sqrt(jnp.clip(x / in_max, 0.0, 1.0)) - 1.0
    u = 2.0 * t * t - 1.0
    p = pq_coeffs[0]
    q = pq_coeffs[1]
    accp = jnp.full_like(t, p[0])
    for c in p[1:]:
        accp = accp * u + c
    accq = jnp.full_like(t, q[0])
    for c in q[1:]:
        accq = accq * u + c
    return (accp + t * accq) * out_max


def eval_curve(x, coeffs, in_max=MAXVAL, out_max=MAXVAL):
    """Evaluate a fitted curve on device. x in [0, in_max] (clamped),
    output scaled by out_max (the fit maps [0,1]->[0,1] range semantics).

    NOTE: gathers with rank>2 index arrays hit a ~70x slower TPU lowering
    (measured on v5e: 723 ms vs 10 ms for the same 72M elements), so the
    takes run on a 2-D view.
    """
    if coeffs.ndim == 1:
        # Chebyshev series on the warped domain: Clenshaw recurrence
        t = 2.0 * jnp.sqrt(jnp.clip(x / in_max, 0.0, 1.0)) - 1.0
        t2 = 2.0 * t
        b1 = jnp.zeros_like(t)
        b2 = jnp.zeros_like(t)
        d = coeffs.shape[0]
        for kk in range(d - 1, 0, -1):
            b1, b2 = coeffs[kk] + t2 * b1 - b2, b1
        y = coeffs[0] + t * b1 - b2
        return y * out_max

    shape = x.shape
    if x.ndim != 2:
        x = x.reshape(-1, shape[-1])
    t = jnp.sqrt(jnp.clip(x / in_max, 0.0, 1.0))
    s = t * K
    k = jnp.minimum(s.astype(jnp.int32), K - 1)
    u = s - k.astype(s.dtype)
    a = jnp.take(coeffs[:, 0], k)
    b = jnp.take(coeffs[:, 1], k)
    c = jnp.take(coeffs[:, 2], k)
    d = jnp.take(coeffs[:, 3], k)
    y = ((a * u + b) * u + c) * u + d
    y = y * out_max
    return y.reshape(shape)


def fit_curves(dense_luts, in_max=1.0):
    """Fit several curves into ONE stackable representation.

    Chebyshev fits of different degree zero-pad exactly; if any curve
    needs the segment fallback, all are refit as segments so the stack
    is homogeneous (callers jnp.stack these and index by channel).
    """
    fits = [fit_curve(np.asarray(lut), in_max) for lut in dense_luts]
    if all(f.ndim == 1 for f in fits):
        d = max(f.shape[0] for f in fits)
        return np.stack([np.pad(f, (0, d - f.shape[0])) for f in fits])
    return np.stack([f if f.ndim == 2
                     else fit_curve(np.asarray(lut), in_max,
                                    allow_poly=False)
                     for f, lut in zip(fits, dense_luts)])
