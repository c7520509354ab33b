"""AMaZE as a Pallas TPU kernel: halo-windowed VMEM tiles (EXPERIMENTAL).

STATUS: compiles and matches the XLA path numerically, but the monolithic
stage chain forces ~88MB of scoped VMEM (Mosaic keeps every roll-shift
intermediate live), which spills and runs slower than the whole-plane XLA
formulation (425ms vs 182ms at 24MP). Disabled by default; the plan of
record is to split into 3 stage kernels with a handful of HBM intermediates
(vcd/hcd/hvwt), bounding live windows to ~12 per kernel.

The whole-plane XLA formulation streams ~100 intermediate planes through
HBM (~180ms at 24MP). Here the grid walks TILE x TILE output tiles; each
program DMAs a (TILE+2*HALO)^2 window of the mosaic from HBM into VMEM and
runs the full stage chain (`_amaze_core`, roll-shift formulation — rolls
wrap inside the halo, which is discarded) entirely on-chip, writing only
the 3 output tiles. HBM traffic drops to ~1 read + 3 writes of the image.

The input stays in HBM (`pl.ANY`) and is windowed with an async copy;
TILE/HALO keep the window lane-aligned (multiples of 128 columns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.image import BAYER_PATTERNS
from art_tpu.demosaic.amaze import HALO, _amaze_core

TILE = 256
PAD_Y = 32   # row halo (sublane-aligned)
PAD_X = 64   # col halo (window width must be lane-aligned to 128)


def _parity_masks(pattern, shape):
    """Bayer masks from iota parity (window origin parity is even)."""
    h, w = shape
    rp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2
    cp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2
    idx2 = rp * 2 + cp
    masks = []
    for color in "RGB":
        m = None
        for pos, c in enumerate(pattern):
            if c == color:
                e = idx2 == pos
                m = e if m is None else (m | e)
        masks.append(m)
    return tuple(masks)


def _kernel(clips_ref, hbm_ref, out_ref, win, sem, *, pattern):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * TILE, TILE + 2 * PAD_Y),
                   pl.ds(j * TILE, TILE + 2 * PAD_X)],
        win, sem)
    copy.start()
    copy.wait()
    x = win[:] * (1.0 / 65535.0)
    mr, mg, mb = _parity_masks(pattern, x.shape)
    rgb = _amaze_core(x, mr, mg, mb, clips_ref[0, 0], clips_ref[0, 1])
    out_ref[:] = rgb[:, PAD_Y : PAD_Y + TILE, PAD_X : PAD_X + TILE]


@functools.partial(jax.jit, static_argnames=("pattern", "interpret"))
def _run(cfa_padded, pattern, clip_pt, clip_pt8, interpret=False):
    clip_pt = jnp.asarray(clip_pt, jnp.float32)
    clip_pt8 = jnp.asarray(clip_pt8, jnp.float32)
    hp, wp = cfa_padded.shape
    h = hp - 2 * PAD_Y
    w = wp - 2 * PAD_X
    grid = (h // TILE, w // TILE)
    kernel = functools.partial(_kernel, pattern=pattern)
    clips = jnp.stack([clip_pt, clip_pt8]).astype(jnp.float32).reshape(1, 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (3, TILE, TILE), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), cfa_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2 * PAD_Y, TILE + 2 * PAD_X), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(clips, cfa_padded)
    return out


def amaze_pallas(cfa, pattern, clip_pt, clip_pt8):
    """cfa (H, W) f32 with H, W multiples of TILE-compatible padding."""
    if pattern not in BAYER_PATTERNS:
        return None
    h, w = cfa.shape
    if h % TILE or w % TILE:
        return None
    # window origin parity: i*TILE - PAD is even (TILE, PAD even) — masks in
    # the window use the same pattern as the image
    cfa_p = jnp.pad(cfa, ((PAD_Y, PAD_Y), (PAD_X, PAD_X)), mode="reflect")
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _run(cfa_p, pattern, clip_pt, clip_pt8, interpret=interpret)
