"""Bilinear Bayer demosaic (reference: bayer_bilinear_demosaic.cc, 77 LoC).

TPU formulation: instead of the reference's per-pixel FC() branches, each
output plane is a 3x3 normalized convolution of the masked mosaic. With
reflect padding the divisor is the constant 4 for every site and pattern,
so the whole op is shifted adds + one multiply — fully fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks


def _shift_sum(x, weights):
    """Sum of w * x shifted by (dy, dx) over a reflect-padded plane."""
    p = jnp.pad(x, 1, mode="reflect")
    h, w = x.shape
    out = None
    for (dy, dx), wgt in weights.items():
        if wgt == 0:
            continue
        piece = p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] * wgt
        out = piece if out is None else out + piece
    return out


_K_RB = {  # [[1,2,1],[2,4,2],[1,2,1]] / 4
    (-1, -1): 0.25, (-1, 0): 0.5, (-1, 1): 0.25,
    (0, -1): 0.5, (0, 0): 1.0, (0, 1): 0.5,
    (1, -1): 0.25, (1, 0): 0.5, (1, 1): 0.25,
}
_K_G = {  # [[0,1,0],[1,4,1],[0,1,0]] / 4
    (-1, 0): 0.25, (0, -1): 0.25, (0, 0): 1.0, (0, 1): 0.25, (1, 0): 0.25,
}


def bayer_bilinear(cfa, pattern):
    """(H, W) mosaic -> (3, H, W) RGB, same 0..65535 domain."""
    mr, mg, mb = bayer_channel_masks(pattern, cfa.shape, xp=jnp)
    r = _shift_sum(jnp.where(mr, cfa, 0.0), _K_RB)
    g = _shift_sum(jnp.where(mg, cfa, 0.0), _K_G)
    b = _shift_sum(jnp.where(mb, cfa, 0.0), _K_RB)
    # keep original samples exact at their own sites
    r = jnp.where(mr, cfa, r)
    g = jnp.where(mg, cfa, g)
    b = jnp.where(mb, cfa, b)
    return jnp.stack([r, g, b])
