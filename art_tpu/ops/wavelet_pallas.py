"""Wavelet denoise as a single Pallas TPU kernel (1 or 3 planes).

The XLA path streams every à trous level's shifted planes through HBM
(~22ms per 24MP plane even after fixes). Here the full 5-level B3
decompose -> per-level shrink -> reconstruct chain runs on one VMEM halo
window per tile: HBM traffic is one read + one write of the plane.

Noise statistics are per tile, like the reference's Mad() over each
overlapped tile (FTblockDN.cc:442 Tile_calc + madL): a sigma passed in
as the sentinel -1 is estimated INSIDE the kernel from the tile's own
finest detail level by bisection (the reference's 65536-bin histogram
median becomes ~14 compare+mean reductions over the VMEM window — no
extra HBM traffic). The estimate runs on the full halo window, so
neighboring tiles share 2*PAD rows/cols of data and the sigma field
varies smoothly across tile seams. Passing sigma >= 0 pins the global
value (used by tests and by callers that precompute statistics).

The multi-plane entry denoises the stacked (C, H, W) planes in one
pallas_call (grid leads with the plane index; per-plane sigma/strength/
detail rows in SMEM) — one dispatch for Y, U, V instead of three.

Halo: each level lv smooths with taps at +-2*2^lv; cumulative reach for
5 levels is 62 (+1 for the shrink energy window) -> 64-pixel halo.
Tiles are rectangular (256x1024): the wide lane dimension cuts the
window/tile compute overhead from 2.25x (256^2) to 1.69x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.ops.wavelet import _B3

TILE_Y = 256  # NOTE: 512-row tiles cut halo overhead 1.69x->1.41x but Mosaic
TILE_X = 1024  # compile time explodes (>25min vs ~5min) -- not worth it
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


def _mad_sigma_vmem(d, iters=14):
    """Tile-local noise sigma: median(|d|) / 0.6745 by bisection.

    Each iteration is one VPU compare + mean over the VMEM window
    (~0.4us at 425k elements), so 14 iterations cost nothing next to
    the blur chain. Matches ops.wavelet.mad_sigma's estimator."""
    a = jnp.abs(d)
    lo = jnp.zeros((), jnp.float32)
    hi = jnp.max(a)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        below = jnp.mean((a <= mid).astype(jnp.float32))
        go_up = below < 0.5
        lo = jnp.where(go_up, mid, lo)
        hi = jnp.where(go_up, hi, mid)
    return 0.5 * (lo + hi) * (1.0 / 0.6745)


def _shrink(d, t2, detail_blend):
    """shrink_sure_like: attenuate by 3x3 local energy vs noise.

    The gain e9/(e9+t2) uses the VPU's approximate reciprocal — one
    divide per level per plane is 15 full-precision divides per pixel
    otherwise, and a ~1e-3-relative gain error is invisible in a
    shrink factor."""
    e = d * d
    s = e + _roll2(e, 1, 0) + _roll2(e, -1, 0)
    e9 = (s + _roll2(s, 0, 1) + _roll2(s, 0, -1)) * (1.0 / 9.0)
    factor = e9 * pl.reciprocal(e9 + t2 + 1e-12, approx=True)
    dd = d * factor
    return dd + (d - dd) * detail_blend


def _kernel(sc_ref, x_hbm, out_ref, win, sem, *, tx):
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    wy = TILE_Y + 2 * PAD
    wx = tx + 2 * PAD
    copy = pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(i * TILE_Y, wy), pl.ds(j * tx, wx)], win, sem)
    copy.start()
    copy.wait()
    x = win[:]
    out = _wavelet_chain(x, sc_ref[c, 0], sc_ref[c, 1], sc_ref[c, 2])
    out_ref[0] = out[PAD : PAD + TILE_Y, PAD : PAD + tx]


def _pick_tx_plane(w):
    """Full-width lane tile for awkward widths (not a TILE_X multiple,
    e.g. 6016): kills the halo recompute in x AND the pad-to-tile waste,
    when the halo window fits VMEM. TILE_X-multiple widths keep the
    standard tiling (per-tile MAD granularity unchanged)."""
    if w % TILE_X != 0 and w % 128 == 0 \
            and (TILE_Y + 2 * PAD) * (w + 2 * PAD) * 4 * 6 \
            <= 64 * 1024 * 1024:
        return w
    return TILE_X


@functools.partial(jax.jit, static_argnames=("tx", "interpret"))
def _run(x3, sc, tx=TILE_X, interpret=False):
    """x3: (C, H, W) planes; sc: (C, 3) [sigma, strength, detail] rows."""
    n, h, w = x3.shape
    grid = (n, h // TILE_Y, w // tx)
    wy = TILE_Y + 2 * PAD
    wx = tx + 2 * PAD
    xp = jnp.pad(x3, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    return pl.pallas_call(
        functools.partial(_kernel, tx=tx),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((1, TILE_Y, tx),
                               lambda c, i, j: (c, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), x3.dtype),
        scratch_shapes=[pltpu.VMEM((wy, wx), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(sc, xp)


def _pad_to_tiles(x3):
    _, h, w = x3.shape
    ph = (-h) % TILE_Y
    pw = (-w) % TILE_X
    if ph or pw:
        x3 = jnp.pad(x3, ((0, 0), (0, ph), (0, pw)), mode="reflect")
    return x3, ph, pw


def wavelet_denoise_pallas_multi(x3, sigmas, strengths, blends):
    """Denoise stacked (C, H, W) planes in one kernel; None if too small."""
    n, h, w = x3.shape
    if h < TILE_Y or w < TILE_X:
        return None
    xp, ph, pw = _pad_to_tiles(x3)
    sc = jnp.stack([jnp.asarray(sigmas, jnp.float32),
                    jnp.asarray(strengths, jnp.float32),
                    jnp.asarray(blends, jnp.float32)], axis=1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _run(xp, sc, interpret=interpret)
    if ph or pw:
        out = out[:, :h, :w]
    return out


def wavelet_denoise_pallas(x, sigma, strength, detail_blend=0.0):
    """Denoised plane, or None when too small to tile."""
    out = wavelet_denoise_pallas_multi(
        x[None], jnp.asarray(sigma)[None], jnp.asarray(strength)[None],
        jnp.asarray(detail_blend)[None])
    return None if out is None else out[0]


# ---------------------------------------------------------------------------
# Fused RGB kernel: the denoise op's whole elementwise pre/post chain
# (exposure gain, gamma transform, YUV split) runs inside the wavelet
# kernel on VMEM values. jnp.power lowers to exp+log on the VPU and the
# two gamma passes alone cost ~16ms/24MP — as Chebyshev fits (host-side,
# gamma is a plan-time scalar) they ride the same FMA pipes as the blur.
# Forward gamma x^(1/g) uses the x^(1/8) warp (3 sqrts) to tame the
# endpoint singularity; inverse x^g uses the standard sqrt warp.

def _horner_split(t, p, q):
    """Even/odd Horner eval: f(t) = P(u) + t*Q(u), u = 2t^2-1, with
    scalar coefficient lists (SMEM reads)."""
    u = 2.0 * t * t - 1.0
    accp = jnp.full_like(t, p[0])
    for c in p[1:]:
        accp = accp * u + c
    accq = jnp.full_like(t, q[0])
    for c in q[1:]:
        accq = accq * u + c
    return accp + t * accq


def gamma_fwd_eval(x, p, q):
    """x^(1/g) on [0,1] via the (2,K) x^(1/8)-warp split fit."""
    w = jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.clip(x, 0.0, 1.0))))
    return _horner_split(2.0 * w - 1.0, list(p), list(q))


def gamma_inv_eval(x, p, q):
    """x^g on [0,1] via the (2,K) sqrt-warp split fit."""
    t = 2.0 * jnp.sqrt(jnp.clip(x, 0.0, 1.0)) - 1.0
    return _horner_split(t, list(p), list(q))


def _wavelet_chain(plane, sigma, strength, detail_blend):
    """5-level shrink chain; sigma < 0 triggers the tile-local MAD
    estimate from the finest detail level (FTblockDN.cc Tile_calc)."""
    out = jnp.zeros_like(plane)
    cur = plane
    for lv in range(LEVELS):
        smooth = _sep_blur_vmem(cur, 2 ** lv)
        d = cur - smooth
        if lv == 0:
            sigma = jnp.where(sigma < 0.0, _mad_sigma_vmem(d), sigma)
        t2 = (strength * sigma / (2.0 ** lv)) ** 2
        out = out + _shrink(d, t2, detail_blend)
        cur = smooth
    return out + cur


def _kernel_rgb(pv_ref, cf_ref, ci_ref, x_hbm, out_ref, win, sem, *,
                kf, ki, pre, tx):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wy = TILE_Y + 2 * PAD
    wx = tx + 2 * PAD
    copy = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(i * TILE_Y, wy), pl.ds(j * tx, wx)], win,
        sem)
    copy.start()
    copy.wait()
    lw0 = pv_ref[0, 0]
    lw1 = pv_ref[0, 1]
    lw2 = pv_ref[0, 2]
    gain = pv_ref[0, 3]  # ecomp / MAXVAL
    pf = [cf_ref[0, k] for k in range(kf)]
    qf = [cf_ref[1, k] for k in range(kf)]
    pi = [ci_ref[0, k] for k in range(ki)]
    qi = [ci_ref[1, k] for k in range(ki)]

    def fwd(x):
        return gamma_fwd_eval(jnp.clip(x * gain, 0.0, 1.0), pf, qf)

    if pre:
        # fused raw head: WB multipliers + clip + cam2work matrix
        # (develop.py rgb2work) on VMEM values — saves a whole-plane
        # HBM pass when denoise is the first op after demosaic
        q = [pv_ref[0, 14 + k] for k in range(12)]
        r0 = jnp.clip(win[0] * q[0], 0.0, 65535.0)
        g0 = jnp.clip(win[1] * q[1], 0.0, 65535.0)
        b0 = jnp.clip(win[2] * q[2], 0.0, 65535.0)
        r = fwd(q[3] * r0 + q[4] * g0 + q[5] * b0)
        g = fwd(q[6] * r0 + q[7] * g0 + q[8] * b0)
        b = fwd(q[9] * r0 + q[10] * g0 + q[11] * b0)
    else:
        r = fwd(win[0])
        g = fwd(win[1])
        b = fwd(win[2])
    y = lw0 * r + lw1 * g + lw2 * b
    u = y - b
    v = r - y

    res = []
    for c, plane in enumerate((y, u, v)):
        res.append(_wavelet_chain(plane, pv_ref[0, 4 + c],
                                  pv_ref[0, 7 + c], pv_ref[0, 10 + c]))
    y2, u2, v2 = res
    b2 = y2 - u2
    r2 = v2 + y2
    g2 = (y2 - r2 * lw0 - b2 * lw2) / lw1
    inv_gain = pv_ref[0, 13]  # MAXVAL / ecomp

    def inv(x):
        return gamma_inv_eval(x, pi, qi) * inv_gain

    sl = (slice(PAD, PAD + TILE_Y), slice(PAD, PAD + tx))
    out_ref[0] = inv(r2)[sl]
    out_ref[1] = inv(g2)[sl]
    out_ref[2] = inv(b2)[sl]


def _pick_tx_rgb(w):
    """Lane-dim tile for the fused RGB kernel: full-width when the
    3-plane halo window fits VMEM — kills both the x halo recompute and
    the pad-to-tile waste. Measured at 4096x6016 (r5 A/B, min over
    batches): full-width 23.80 ms vs 24.25 (TILE_X=1024) and 23.74
    (3072); the 88MB live-set bound admits the 24MP bench width (was
    80MB, which rejected it by 1MB and cost ~0.5 ms/frame)."""
    if w % 128 == 0 \
            and 3 * (TILE_Y + 2 * PAD) * (w + 2 * PAD) * 4 * 3 \
            <= 88 * 1024 * 1024:
        return w
    return TILE_X


@functools.partial(jax.jit,
                   static_argnames=("kf", "ki", "pre", "tx", "interpret"))
def _run_rgb(rgb, pv, cfwd, cinv, kf, ki, pre=False, tx=TILE_X,
             interpret=False):
    _, h, w = rgb.shape
    grid = (h // TILE_Y, w // tx)
    wy = TILE_Y + 2 * PAD
    wx = tx + 2 * PAD
    xp = jnp.pad(rgb, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="reflect")
    return pl.pallas_call(
        functools.partial(_kernel_rgb, kf=kf, ki=ki, pre=pre, tx=tx),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((3, TILE_Y, tx),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rgb.shape, rgb.dtype),
        scratch_shapes=[pltpu.VMEM((3, wy, wx), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pv.reshape(1, -1), cfwd, cinv, xp)


def wavelet_denoise_pallas_rgb(rgb, lum_w, ecomp, gam_fwd, gam_inv,
                               sigmas, strengths, blends, pre=None):
    """Fused gamma+YUV+wavelet denoise of a (3, H, W) RGB stack in the
    0..MAXVAL domain. Returns denoised RGB, or None when too small.

    sigmas/strengths/blends: length-3 (Y, U, V) traced/host scalars;
    gam_fwd/gam_inv: (2, K) split-fit coefficient arrays; pre (optional):
    (mults[3], cam2work 3x3) fused raw head applied before the gamma."""
    _, h, w = rgb.shape
    if h < TILE_Y or w < min(TILE_X, _pick_tx_rgb(w)):
        return None
    tx = _pick_tx_rgb(w)
    if tx == TILE_X:
        xp, ph, pw = _pad_to_tiles(rgb)
    else:
        ph = (-h) % TILE_Y
        pw = 0
        xp = (jnp.pad(rgb, ((0, 0), (0, ph), (0, 0)), mode="reflect")
              if ph else rgb)
    MAXVAL = 65535.0
    parts = [
        jnp.asarray(lum_w, jnp.float32).reshape(3),
        jnp.asarray(ecomp / MAXVAL, jnp.float32).reshape(1),
        jnp.stack([jnp.asarray(s, jnp.float32) for s in sigmas]),
        jnp.stack([jnp.asarray(s, jnp.float32) for s in strengths]),
        jnp.stack([jnp.asarray(b, jnp.float32) for b in blends]),
        jnp.asarray(MAXVAL / ecomp, jnp.float32).reshape(1),
    ]
    if pre is not None:
        parts.append(jnp.asarray(pre[0], jnp.float32).reshape(3))
        parts.append(jnp.asarray(pre[1], jnp.float32).reshape(9))
    pv = jnp.concatenate(parts)
    cfwd = jnp.asarray(gam_fwd, jnp.float32)
    cinv = jnp.asarray(gam_inv, jnp.float32)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _run_rgb(xp, pv, cfwd, cinv, int(cfwd.shape[1]),
                   int(cinv.shape[1]), pre=pre is not None,
                   interpret=interpret)
    if ph or pw:
        out = out[:, :h, :w]
    return out
