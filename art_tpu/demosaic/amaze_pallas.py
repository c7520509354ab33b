"""AMaZE as three Pallas TPU stage kernels (halo-windowed VMEM tiles).

The monolithic single-kernel attempt kept ~186 roll-shift intermediates
live in VMEM (88MB scoped at TILE=256) and spilled. This split bounds the
live set per kernel by cutting the stage chain where the cross-stage state
is smallest (amaze.py stage functions):

  K1  x                 -> vcd, hcd, hvwt        (stages 1-4, reach ~9)
  K2  x, vcd, hcd, hvwt -> green, hvwt'          (stages 5-6, reach ~13)
  K3  x, green, hvwt'   -> rgb                   (stages 7-8, reach ~11)

Each kernel walks TILE_Y x TILE_X output tiles; inputs stay in HBM
(`pl.ANY`) and are windowed with async copies into VMEM scratch
(window = (TILE_Y+2*PAD_Y, TILE_X+2*PAD_X)).

Intermediates are written (via explicit VMEM->HBM DMA) into buffers that
carry a PAD ring, stacked as one (n, H+2*PAD_Y, W+2*PAD_X) array per
kernel, so the next kernel's halo windows read them directly — no
materialized `jnp.pad` between kernels. The ring itself stays
uninitialized; it only influences outputs within the stencil reach of the
image boundary, which the RCD border fallback overwrites (amaze dispatch,
reference border_interpolate2 demosaic_algos.cc:200).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.image import BAYER_PATTERNS
from art_tpu.demosaic.amaze import _stages_1to4, _stages_5to6, _stages_7to8

TILE_Y = 256  # rectangular tiles: wide cols cut the halo compute overhead
TILE_X = 2048
HALO_Y = 16  # row stencil halo (max stage reach is ~13, rounded to 16)
HALO_X = 128  # col halo: Mosaic requires DMA column slices (start AND
              # width) to be lane (128) aligned, so the halo cannot shrink
              # below 128; instead the 256 wasted columns are amortized
              # over a 2048-wide tile (overhead 1.27x vs 1.41x at 1024)
PAD_Y = 16   # buffer ring, rows
PAD_X = 128  # buffer ring, cols (matches HALO_X)


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


def _stage_call(stage, in_planes, n_out, pattern, shape, dtype, interpret,
                vmem_mb=118, final=False):
    """Build a halo-window pallas_call for one stage function.

    Inputs: clips SMEM array + len(in_planes) HBM buffers; in_planes[k] is
    the plane count of buffer k (a (n, H+2PY, W+2PX) stack, or (H+2PY,
    W+2PX) when 1). Output: one padded (n_out, H+2PY, W+2PX) stack written
    by DMA — or, when `final`, a (3, H, W) VMEM-blocked array.
    """
    h, w = shape
    grid = (h // TILE_Y, w // TILE_X)
    wy, wx = TILE_Y + 2 * HALO_Y, TILE_X + 2 * HALO_X
    oy, ox = PAD_Y - HALO_Y, PAD_X - HALO_X  # window offset inside the ring
    n_in = len(in_planes)

    def kernel(clips_ref, *refs):
        ins = refs[:n_in]
        out = refs[n_in]
        wins = refs[n_in + 1 : n_in + 1 + n_in]
        if final:
            sem = refs[-1]
            ostage = None
        else:
            ostage = refs[-2]
            sem = refs[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)
        for k in range(n_in):
            src = ins[k]
            if in_planes[k] > 1:
                src = src.at[:, pl.ds(i * TILE_Y + oy, wy),
                             pl.ds(j * TILE_X + ox, wx)]
            else:
                src = src.at[pl.ds(i * TILE_Y + oy, wy),
                             pl.ds(j * TILE_X + ox, wx)]
            copy = pltpu.make_async_copy(src, wins[k], sem)
            copy.start()
            copy.wait()
        planes = []
        for k in range(n_in):
            if in_planes[k] > 1:
                planes.extend(wins[k][c] for c in range(in_planes[k]))
            else:
                planes.append(wins[k][:])
        mr, mg, mb = _parity_masks(pattern, (wy, wx))
        clip_pt = clips_ref[0, 0]
        clip_pt8 = clips_ref[0, 1]
        # fast=True: VPU approx reciprocal + 1 Newton step for the ~40
        # divides/pixel (see amaze._make_rcp); Pallas TPU path only
        if stage == 1:
            res = _stages_1to4(planes[0], mg, clip_pt, clip_pt8, fast=True)
        elif stage == 2:
            x, vcd, hcd, hvwt = planes
            res = _stages_5to6(x, mg, vcd, hcd, hvwt, fast=True)
        else:
            x, green, hvwt = planes
            rgb = _stages_7to8(x, mr, mg, mb, green, hvwt, clip_pt,
                               fast=True)
            res = (rgb,)
        if final:
            out[:] = res[0][:, HALO_Y : HALO_Y + TILE_Y,
                            HALO_X : HALO_X + TILE_X]
        else:
            for c, val in enumerate(res):
                ostage[c] = val[HALO_Y : HALO_Y + TILE_Y,
                                HALO_X : HALO_X + TILE_X]
            wr = pltpu.make_async_copy(
                ostage,
                out.at[:, pl.ds(i * TILE_Y + PAD_Y, TILE_Y),
                       pl.ds(j * TILE_X + PAD_X, TILE_X)],
                sem)
            wr.start()
            wr.wait()

    win_scratch = [
        pltpu.VMEM((n, wy, wx) if n > 1 else (wy, wx), jnp.float32)
        for n in in_planes
    ]
    if final:
        out_shape = jax.ShapeDtypeStruct((3, h, w), dtype)
        out_specs = pl.BlockSpec((3, TILE_Y, TILE_X),
                                 lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM)
        scratch = win_scratch + [pltpu.SemaphoreType.DMA]
    else:
        out_shape = jax.ShapeDtypeStruct(
            (n_out, h + 2 * PAD_Y, w + 2 * PAD_X), dtype)
        out_specs = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        scratch = win_scratch + [
            pltpu.VMEM((n_out, TILE_Y, TILE_X), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * n_in,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )


def _padh(a):
    return jnp.pad(a, ((PAD_Y, PAD_Y), (PAD_X, PAD_X)), mode="reflect")


@functools.partial(jax.jit, static_argnames=("pattern", "interpret"))
def _run(cfa, pattern, clip_pt, clip_pt8, interpret=False):
    h, w = cfa.shape
    x = cfa * (1.0 / 65535.0)
    clips = jnp.stack([jnp.asarray(clip_pt, jnp.float32),
                       jnp.asarray(clip_pt8, jnp.float32)]).reshape(1, 2)
    mk = functools.partial(_stage_call, pattern=pattern, shape=(h, w),
                           dtype=x.dtype, interpret=interpret)
    xp = _padh(x)
    s1 = mk(1, [1], 3)(clips, xp)          # (3, hp, wp): vcd, hcd, hvwt
    s2 = mk(2, [1, 3], 2)(clips, xp, s1)   # (2, hp, wp): green, hvwt'
    rgb = mk(3, [1, 2], 1, final=True)(clips, xp, s2)
    return rgb


def amaze_pallas(cfa, pattern, clip_pt, clip_pt8):
    """cfa (H, W) f32 in 0..65535; pads itself to TILE multiples."""
    if pattern not in BAYER_PATTERNS:
        return None
    h, w = cfa.shape
    if h < TILE_Y or w < TILE_X // 2:
        return None  # tiny images: whole-plane XLA path
    # mid-size images pad up to one tile: even a 2x pad waste beats the
    # whole-plane XLA path (~5x slower per pixel at 6MP, measured r5 —
    # the old 2-tile minimum sent 2048x3072 frames down it)
    ph = (-h) % TILE_Y
    pw = (-w) % TILE_X
    x = cfa
    if ph or pw:
        # even pad keeps the Bayer parity of the reflected content aligned
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    interpret = jax.default_backend() not in ("tpu", "axon")
    rgb = _run(x, pattern, clip_pt, clip_pt8, interpret=interpret)
    if ph or pw:
        rgb = rgb[:, :h, :w]
    return rgb
