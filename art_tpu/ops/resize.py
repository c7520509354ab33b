"""Resize: Lanczos-3 / nearest (reference: ipresize.cc).

TPU formulation: separable Lanczos as two dense matmuls — out = A_r @ img
@ A_c^T with host-built interpolation matrices. At 24MP->6MP this is a few
tens of GFLOPs, which the MXU does in well under a millisecond; the
reference's per-pixel weighted loops become two GEMMs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_A = 3  # Lanczos support


def lanczos_matrix(n_in, n_out):
    """(n_out, n_in) row-stochastic Lanczos-3 resampling matrix."""
    scale = n_out / n_in
    support = _A / min(scale, 1.0)
    x_out = np.arange(n_out)
    src = (x_out + 0.5) / scale - 0.5
    A = np.zeros((n_out, n_in), dtype=np.float64)
    kscale = min(scale, 1.0)
    for i, c in enumerate(src):
        lo = int(np.floor(c - support))
        hi = int(np.ceil(c + support))
        idx = np.arange(lo, hi + 1)
        t = (idx - c) * kscale
        w = np.sinc(t) * np.sinc(t / _A)
        w[np.abs(t) >= _A] = 0.0
        idxc = np.clip(idx, 0, n_in - 1)
        s = w.sum()
        if s != 0:
            w /= s
        for j, wt in zip(idxc, w):
            A[i, j] += wt
    return A.astype(np.float32)


def resize_plan(in_shape, out_shape):
    h, w = in_shape
    oh, ow = out_shape
    return lanczos_matrix(h, oh), lanczos_matrix(w, ow)


def apply_resize(rgb, a_rows, a_cols):
    """rgb (3, H, W) -> (3, H', W') via two GEMMs (f32 accumulate)."""
    tmp = jnp.einsum("oh,chw->cow", a_rows, rgb,
                     preferred_element_type=jnp.float32,
                     precision="highest")
    out = jnp.einsum("pw,cow->cop", a_cols, tmp,
                     preferred_element_type=jnp.float32,
                     precision="highest")
    return out


def resize_nearest(rgb, out_shape):
    oh, ow = out_shape
    h, w = rgb.shape[1:]
    ri = jnp.clip((jnp.arange(oh) + 0.5) * h / oh, 0, h - 1).astype(jnp.int32)
    ci = jnp.clip((jnp.arange(ow) + 0.5) * w / ow, 0, w - 1).astype(jnp.int32)
    return rgb[:, ri][:, :, ci]
