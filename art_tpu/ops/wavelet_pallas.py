"""Wavelet denoise of one plane as a single Pallas TPU kernel.

The XLA path streams every à trous level's shifted planes through HBM
(~22ms per 24MP plane even after fixes). Here the full 5-level B3
decompose -> per-level shrink -> reconstruct chain runs on one VMEM halo
window per tile: HBM traffic is one read + one write of the plane.

The noise sigma is a global statistic (MAD of the finest detail level),
so it is estimated OUTSIDE the kernel on a subsampled plane and passed
in via SMEM — same two-phase structure as the reference's per-tile
Mad() statistics feeding its shrinkage loops (FTblockDN.cc).

Halo: each level lv smooths with taps at +-2*2^lv; cumulative reach for
5 levels is 62 (+1 for the shrink energy window) -> 64-pixel halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.ops.wavelet import _B3

TILE = 256
PAD = 64
LEVELS = 5


def _roll2(a, dy, dx):
    out = a
    if dy:
        out = jnp.roll(out, -dy, axis=0)
    if dx:
        out = jnp.roll(out, -dx, axis=1)
    return out


def _sep_blur_vmem(a, spacing):
    """B3 separable blur with dilated taps, roll shifts (VMEM values)."""
    k = [float(v) for v in _B3]
    col = k[2] * a
    for i, d in ((0, -2), (1, -1), (3, 1), (4, 2)):
        col = col + k[i] * _roll2(a, d * spacing, 0)
    out = k[2] * col
    for i, d in ((0, -2), (1, -1), (3, 1), (4, 2)):
        out = out + k[i] * _roll2(col, 0, d * spacing)
    return out


def _shrink(d, t2, detail_blend):
    """shrink_sure_like: attenuate by 3x3 local energy vs noise."""
    e = d * d
    s = e + _roll2(e, 1, 0) + _roll2(e, -1, 0)
    e9 = (s + _roll2(s, 0, 1) + _roll2(s, 0, -1)) * (1.0 / 9.0)
    factor = e9 / (e9 + t2 + 1e-12)
    dd = d * factor
    return dd + (d - dd) * detail_blend


def _kernel(sc_ref, x_hbm, out_ref, win, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wy = TILE + 2 * PAD
    wx = TILE + 2 * PAD
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * TILE, wy), pl.ds(j * TILE, wx)], win, sem)
    copy.start()
    copy.wait()
    x = win[:]
    sigma = sc_ref[0, 0]
    strength = sc_ref[0, 1]
    detail_blend = sc_ref[0, 2]
    out = jnp.zeros_like(x)
    cur = x
    for lv in range(LEVELS):
        smooth = _sep_blur_vmem(cur, 2 ** lv)
        d = cur - smooth
        t2 = (strength * sigma / (2.0 ** lv)) ** 2
        out = out + _shrink(d, t2, detail_blend)
        cur = smooth
    out = out + cur  # residual
    out_ref[:] = out[PAD : PAD + TILE, PAD : PAD + TILE]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x, sigma, strength, detail_blend, interpret=False):
    h, w = x.shape
    grid = (h // TILE, w // TILE)
    wy = TILE + 2 * PAD
    xp = jnp.pad(x, PAD, mode="reflect")
    sc = jnp.stack([jnp.asarray(sigma, jnp.float32),
                    jnp.asarray(strength, jnp.float32),
                    jnp.asarray(detail_blend, jnp.float32)]).reshape(1, 3)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((wy, wy), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(sc, xp)


def wavelet_denoise_pallas(x, sigma, strength, detail_blend=0.0):
    """Denoised plane, or None when too small to tile."""
    h, w = x.shape
    if h < TILE or w < TILE:
        return None
    ph = (-h) % TILE
    pw = (-w) % TILE
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _run(x, sigma, strength, detail_blend, interpret=interpret)
    if ph or pw:
        out = out[:h, :w]
    return out
