"""Shared filter primitives: box blur, gaussian, guided filter.

Reference: ``boxblur.h`` (SSE box blur), ``gauss.cc`` (separable gaussian),
``guidedfilter.cc`` (He et al. guided filter built on box means).

TPU formulations:
- box blur: two cumulative-sum passes (prefix sums are log-depth scans on
  TPU; bandwidth-bound, no gather);
- gaussian: separable shift-multiply-add (C=1 NCHW convs pad the channel
  dim to the native tile on TPU and blow HLO temps up ~170x);
- guided filter: 6 box means + elementwise algebra, exactly the reference's
  structure (guidedfilter.cc:27-31 subsampling is unnecessary on TPU for
  the radii the pipeline uses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def box_blur(x, radius):
    """Mean filter with window (2r+1)^2, edge-clamped counts (2-D plane)."""
    if radius <= 0:
        return x
    r = int(radius)
    h, w = x.shape

    def blur_axis(a, axis):
        n = a.shape[axis]
        c = jnp.cumsum(a, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        c = jnp.concatenate([zero, c], axis=axis)  # c[i] = sum of first i
        hi = jnp.clip(jnp.arange(n) + r + 1, 0, n)
        lo = jnp.clip(jnp.arange(n) - r, 0, n)
        s = jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)
        cnt = (hi - lo).astype(a.dtype)
        shape = [1, 1]
        shape[axis] = n
        return s / cnt.reshape(shape)

    return blur_axis(blur_axis(x, 0), 1)


def _gauss_kernel(sigma):
    r = max(1, int(np.ceil(3.0 * sigma)))
    xs = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gauss_blur(x, sigma):
    """Separable gaussian on a 2-D plane (reference gauss.cc semantics).

    Shift-multiply-add, NOT lax.conv: a C=1 NCHW conv on TPU pads the
    channel dim to the native tile and blows HLO temp memory up ~170x
    (observed: 144MB unpadded -> 24GB padded at 24MP).
    """
    if sigma <= 0.1:
        return x
    k = _gauss_kernel(float(sigma))
    r = (len(k) - 1) // 2
    h, w = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="reflect")
    col = sum(float(k[i]) * xp[i : i + h, :] for i in range(len(k)))
    cp = jnp.pad(col, ((0, 0), (r, r)), mode="reflect")
    return sum(float(k[i]) * cp[:, i : i + w] for i in range(len(k)))


def guided_filter(guide, src, radius, eps):
    """He et al. guided filter (guidedfilter.cc). guide/src: (H, W)."""
    if radius <= 0:
        return src
    mean_i = box_blur(guide, radius)
    mean_p = box_blur(src, radius)
    mean_ip = box_blur(guide * src, radius)
    mean_ii = box_blur(guide * guide, radius)
    cov_ip = mean_ip - mean_i * mean_p
    var_i = mean_ii - mean_i * mean_i
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    mean_a = box_blur(a, radius)
    mean_b = box_blur(b, radius)
    return mean_a * guide + mean_b


def guided_filter_log(guide, src, radius, eps, base=2.0):
    """Log-domain guided filter (reference guidedFilterLog,
    guidedfilter.h:29-31) used by the tone equalizer."""
    lg = jnp.log(jnp.maximum(guide, 1e-9)) / np.log(base)
    out = guided_filter(lg, jnp.log(jnp.maximum(src, 1e-9)) / np.log(base),
                        radius, eps)
    return jnp.power(base, out)
