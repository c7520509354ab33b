"""Fast device-side 1-D curves: 64-segment piecewise cubic, sqrt-warped.

The reference applies tone curves through 65536-entry LUT gathers
(``LUT.h``). On TPU, gathers from tables >~64 entries hit the slow gather
path (~200 ms per 24MP plane measured on v5e), while <=64-entry tables
lower to fast vector selects (~6 ms) — so the planner refits every curve
into 64 cubic segments, uniform in sqrt(x) to concentrate resolution in
the shadows. Evaluation is 4 small-table takes + a Horner step, fully
fused by XLA.

Accuracy: for smooth tone curves the max refit error is <1e-5 of full
scale (tested against the dense LUT); 64 sqrt-warped segments give ~4000
effective segments near black.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.core.image import MAXVAL

K = 64  # segments


def fit_curve(dense_lut, in_max=1.0):
    """Fit a (N,) dense curve (sampled uniformly on [0, in_max]) into
    (K, 4) cubic coefficients over the sqrt-warped domain.

    Returns float32 (K, 4) with coefficients [a, b, c, d] such that for
    warped coordinate t in segment k with local u = t*K - k:
    y = ((a*u + b)*u + c)*u + d.
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


def eval_curve(x, coeffs, in_max=MAXVAL, out_max=MAXVAL):
    """Evaluate a fitted curve on device. x in [0, in_max] (clamped),
    output scaled by out_max (the fit maps [0,1]->[0,1] range semantics).

    NOTE: gathers with rank>2 index arrays hit a ~70x slower TPU lowering
    (measured on v5e: 723 ms vs 10 ms for the same 72M elements), so the
    takes run on a 2-D view.
    """
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
