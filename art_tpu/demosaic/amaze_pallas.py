"""AMaZE as three Pallas TPU stage kernels (halo-windowed VMEM tiles).

The monolithic single-kernel attempt kept ~186 roll-shift intermediates
live in VMEM (88MB scoped at TILE=256) and spilled. This split bounds the
live set per kernel by cutting the stage chain where the cross-stage state
is smallest (amaze.py stage functions):

  K1  x                 -> vcd, hcd, hvwt        (stages 1-4, reach ~9)
  K2  x, vcd, hcd, hvwt -> green, hvwt'          (stages 5-6, reach ~13)
  K3  x, green, hvwt'   -> rgb                   (stages 7-8, reach ~11)

Each kernel walks TILE x TILE output tiles; inputs stay in HBM
(`pl.ANY`) and are windowed with async copies into VMEM scratch
(window = (TILE+2*PAD_Y, TILE+2*PAD_X), lane-aligned). HBM traffic is
~13 plane passes total (vs. hundreds of materialized roll-shift planes on
the whole-plane XLA path). Intermediates are re-padded (reflect) between
kernels so every window read stays in bounds; the reflected halo only
perturbs the outer HALO ring, which amaze_demosaic's RCD border fallback
overwrites anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.image import BAYER_PATTERNS
from art_tpu.demosaic.amaze import _stages_1to4, _stages_5to6, _stages_7to8

TILE = 256   # 256 beats 128 by ~20% at 24MP (fewer grid programs); 512
             # exceeds VMEM with the K1 live set
PAD_Y = 16   # row halo (sublane-aligned; max stage reach is ~13)
PAD_X = 64   # col halo (window width 384 = 3 lanes)


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


def _stage_call(stage, n_in, n_out, pattern, shape, dtype, interpret,
                vmem_mb=96):
    """Build a halo-window pallas_call for one stage function.

    Inputs: clips SMEM array + n_in HBM planes (padded by PAD_Y/PAD_X).
    Outputs: n_out (H, W) planes (K3 outputs one (3, H, W) stack).
    """
    h, w = shape
    grid = (h // TILE, w // TILE)
    wy, wx = TILE + 2 * PAD_Y, TILE + 2 * PAD_X

    def kernel(clips_ref, *refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + n_out]
        wins = refs[n_in + n_out : n_in + n_out + n_in]
        sem = refs[-1]
        i = pl.program_id(0)
        j = pl.program_id(1)
        for k in range(n_in):
            copy = pltpu.make_async_copy(
                ins[k].at[pl.ds(i * TILE, wy), pl.ds(j * TILE, wx)],
                wins[k], sem)
            copy.start()
            copy.wait()
        planes = [wn[:] for wn in wins]
        mr, mg, mb = _parity_masks(pattern, (wy, wx))
        clip_pt = clips_ref[0, 0]
        clip_pt8 = clips_ref[0, 1]
        if stage == 1:
            x = planes[0]
            res = _stages_1to4(x, mg, clip_pt, clip_pt8)
        elif stage == 2:
            x, vcd, hcd, hvwt = planes
            res = _stages_5to6(x, mg, vcd, hcd, hvwt)
        else:
            x, green, hvwt = planes
            rgb = _stages_7to8(x, mr, mg, mb, green, hvwt, clip_pt)
            res = (rgb,)
        for out_ref, val in zip(outs, res):
            if val.ndim == 3:
                out_ref[:] = val[:, PAD_Y : PAD_Y + TILE,
                                 PAD_X : PAD_X + TILE]
            else:
                out_ref[:] = val[PAD_Y : PAD_Y + TILE, PAD_X : PAD_X + TILE]

    if stage == 3:
        out_shape = [jax.ShapeDtypeStruct((3, h, w), dtype)]
        out_specs = [pl.BlockSpec((3, TILE, TILE), lambda i, j: (0, i, j),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [jax.ShapeDtypeStruct((h, w), dtype)
                     for _ in range(n_out)]
        out_specs = [pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)] * n_out

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((wy, wx), jnp.float32)
                        for _ in range(n_in)]
        + [pltpu.SemaphoreType.DMA],
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
    vcd, hcd, hvwt = mk(1, 1, 3)(clips, xp)
    green, hvwt2 = mk(2, 4, 2)(clips, xp, _padh(vcd), _padh(hcd),
                               _padh(hvwt))
    # _stages_7to8 already returns the 0..65535 clamped stack
    (rgb,) = mk(3, 3, 1)(clips, xp, _padh(green), _padh(hvwt2))
    return rgb


def amaze_pallas(cfa, pattern, clip_pt, clip_pt8):
    """cfa (H, W) f32 in 0..65535; pads itself to TILE multiples."""
    if pattern not in BAYER_PATTERNS:
        return None
    h, w = cfa.shape
    if h < 2 * TILE or w < 2 * TILE:
        return None  # small images: whole-plane XLA path is fine
    ph = (-h) % TILE
    pw = (-w) % TILE
    x = cfa
    if ph or pw:
        # even pad keeps the Bayer parity of the reflected content aligned
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    interpret = jax.default_backend() not in ("tpu", "axon")
    rgb = _run(x, pattern, clip_pt, clip_pt8, interpret=interpret)
    if ph or pw:
        rgb = rgb[:, :h, :w]
    return rgb
