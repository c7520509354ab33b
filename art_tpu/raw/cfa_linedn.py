"""CFA line (banding) noise removal (reference: cfa_linedn_RT.cc).

Row/column pattern noise on the mosaic: per CFA subgrid, estimate the
per-line offset as the robust mean of the high-pass residual along the
line, clipped to the noise amplitude, and subtract it. Direction follows
LineDenoiseDirection (1=horizontal, 2=vertical, 3=both; the reference also
has a PDAF-aware row blender handled by the PDAF filter).
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.ops.filters import gauss_blur


def _deband_axis(x, amount, axis):
    smooth = gauss_blur(x, 3.0)
    resid = x - smooth
    # robust per-line offset: mean of residuals clipped at 2*amount
    clipped = jnp.clip(resid, -2.0 * amount, 2.0 * amount)
    line = jnp.mean(clipped, axis=axis, keepdims=True)
    line = jnp.clip(line, -amount, amount)
    return x - line


def cfa_line_denoise(cfa, amount, direction=3):
    """amount: LineDenoise slider (0..100) scaled to the 65535 domain."""
    from art_tpu.core.image import subgrid2, subgrid2_scatter

    amp = amount / 100.0 * 65535.0 * 0.02  # max ~2% banding amplitude
    h, w = cfa.shape
    # per-phase subplanes via exact selection matmuls; the four scatters
    # are disjoint and sum to the full mosaic (strided .at updates
    # lower to a slow path at 24MP)
    out = None
    for phase_y in (0, 1):
        for phase_x in (0, 1):
            sub = subgrid2(cfa, phase_y, phase_x)
            if direction & 1:  # horizontal banding -> per-row offsets
                sub = _deband_axis(sub, amp, axis=1)
            if direction & 2:  # vertical banding -> per-column offsets
                sub = _deband_axis(sub, amp, axis=0)
            up = subgrid2_scatter(sub, (h, w), phase_y, phase_x)
            out = up if out is None else out + up
    return out
