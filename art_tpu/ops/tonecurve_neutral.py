"""Neutral tone curve mode (reference: NeutralToneCurve::BatchApply,
curves.cc:891-1010, ApplyState :854-889).

The default ART look: gamut compression toward the output space
(jedypod gamut-compress, parabolic variant), brightness-preserving curve
application, Jzazbz-based hue twists (red/blue) and saturation
compensation.

The math is pure elementwise, but as whole-plane XLA it spans several
fusion boundaries (hue0/ilum from the pre-curve image feed the post-curve
stage) and streams ~20 plane-sized intermediates through HBM (~18 ms of
the 24MP pipeline). The default path here is a single Pallas kernel over
halo-free VMEM tiles: one read + one write of the 3 planes, everything
else in registers. The same scalar-level math (`_neutral_core`) backs the
whole-plane XLA fallback, with curve/matrix parameters read from SMEM in
the kernel and from small arrays in the fallback.

atan2 is not available in Mosaic, so hue extraction uses a degree-15
odd-polynomial atan with quadrant reduction (max err ~2e-7 rad), and the
hue rotation applies sin/cos of the *small* hue shift via Taylor forms
(|shift| <= ~0.35 rad). Both paths share these, so they agree bitwise-ish.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.color import colorspaces as cs
from art_tpu.color import jzazbz
from art_tpu.core.curve1d import fit_curve, fit_curve_split
from art_tpu.core.image import MAXVAL

# gamut compress constants (curves.cc:903-908, hand-tuned ART values)
_DL = np.array([1.1, 1.2, 1.5])
_TH = np.array([0.85, 0.75, 0.95])
_S = (1.0 - _TH) / np.sqrt(_DL - 1.0)


def _output_matrix_for(name: str):
    """Map an output profile name to primaries (RTv4_sRGB -> sRGB etc.)."""
    n = (name or "").lower()
    if "2020" in n:
        return cs.MATRICES_RGB_TO_XYZ["Rec2020"]
    if "adobe" in n:
        return cs.MATRICES_RGB_TO_XYZ["Adobe RGB"]
    if "prophoto" in n or "large" in n:
        return cs.MATRICES_RGB_TO_XYZ["ProPhoto"]
    if "acesp0" in n:
        return cs.MATRICES_RGB_TO_XYZ["ACESp0"]
    if "acesp1" in n or "ap1" in n:
        return cs.MATRICES_RGB_TO_XYZ["ACESp1"]
    return cs.MATRICES_RGB_TO_XYZ["sRGB"]


def _hue_of(rgb, ws):
    _, _, h = jzazbz.rgb_to_jzczhz(
        jnp.float32(rgb[0]), jnp.float32(rgb[1]), jnp.float32(rgb[2]),
        jnp.asarray(ws, dtype=jnp.float32))
    return float(h)


def plan_neutral(pp, ctx, lut, whitept):
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    iwork = np.linalg.inv(work)
    om = _output_matrix_for(pp.icm.output_profile)
    to_out = np.linalg.inv(om) @ work
    to_work = iwork @ om
    # hue anchors measured in Rec2020 (ApplyState ctor, curves.cc:878-889)
    hws = cs.MATRICES_RGB_TO_XYZ["Rec2020"]
    rhue = _hue_of((1.0, 0.0, 0.0), hws)
    bhue = _hue_of((0.0, 0.0, 1.0), hws)
    yhue = _hue_of((1.0, 1.0, 0.0), hws)
    ohue = _hue_of((1.0, 0.5, 0.0), hws)
    yrange = abs(ohue - yhue) * 0.8
    rrange = abs(ohue - rhue)
    # preferred curve representation: even/odd Horner split (half the
    # FMAs of Clenshaw); falls back to Chebyshev / segments for kinky luts
    coeffs = fit_curve_split(lut)
    if coeffs is None:
        coeffs = fit_curve(lut)
    # params vector consumed by _neutral_core: 4 3x3 matrices + hue anchors
    # + whitept (SMEM row in the kernel, plain array in the fallback)
    params = np.concatenate([
        np.asarray(work, np.float64).ravel(),
        np.asarray(iwork, np.float64).ravel(),
        np.asarray(to_out, np.float64).ravel(),
        np.asarray(to_work, np.float64).ravel(),
        np.array([rhue, bhue, yhue, rrange, rrange, yrange, whitept]),
    ]).astype(np.float32)
    data = {"coeffs": coeffs, "params": params}
    return (), data


# ---------------------------------------------------------------------------
# scalar-level math, shared by the Pallas kernel and the XLA fallback

_ATAN_C = (  # minimax odd poly for atan(t), |t|<=1 (deg 15, err ~2e-7)
    0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
    0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def _atan_poly(t):
    s = t * t
    acc = _ATAN_C[7]
    for c in (_ATAN_C[6], _ATAN_C[5], _ATAN_C[4], _ATAN_C[3],
              _ATAN_C[2], _ATAN_C[1], _ATAN_C[0]):
        acc = acc * s + c
    return t * acc


def _atan2_poly(a, b):
    """atan2(a, b) without the atan2 primitive (Mosaic-safe)."""
    aa = jnp.abs(a)
    ab = jnp.abs(b)
    hi = jnp.maximum(aa, ab)
    lo = jnp.minimum(aa, ab)
    t = lo / jnp.maximum(hi, 1e-30)
    r = _atan_poly(t)
    r = jnp.where(aa > ab, (np.pi / 2) - r, r)
    r = jnp.where(b < 0, np.pi - r, r)
    return jnp.where(a < 0, -r, r)


def _sincos_small(d):
    """sin/cos of |d| <= ~0.35 rad via Taylor forms (err < 2e-7)."""
    d2 = d * d
    sin_d = d * (1.0 - d2 * (1.0 / 6.0) * (1.0 - d2 * 0.05))
    cos_d = 1.0 - d2 * 0.5 * (1.0 - d2 * (1.0 / 12.0))
    return sin_d, cos_d


def _clenshaw_sqrtwarp(x, cks):
    """Chebyshev curve eval on the sqrt-warped [0,1] domain (curve1d
    semantics) with coefficients given as a list of scalars."""
    t = 2.0 * jnp.sqrt(jnp.clip(x, 0.0, 1.0)) - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for k in range(len(cks) - 1, 0, -1):
        b1, b2 = cks[k] + t2 * b1 - b2, b1
    return cks[0] + t * b1 - b2


def _jzazbz_fwd(r, g, b, P):
    """working RGB (0..1) -> (jz, az, bz); P[i] indexes the params vector
    (ws at 0..8)."""
    pq = jzazbz._pq
    x = P[0] * r + P[1] * g + P[2] * b
    y = P[3] * r + P[4] * g + P[5] * b
    z = P[6] * r + P[7] * g + P[8] * b
    m = jzazbz._D50_TO_D65
    x, y, z = (float(m[0, 0]) * x + float(m[0, 1]) * y + float(m[0, 2]) * z,
               float(m[1, 0]) * x + float(m[1, 1]) * y + float(m[1, 2]) * z,
               float(m[2, 0]) * x + float(m[2, 1]) * y + float(m[2, 2]) * z)
    lp = pq(0.674207838 * x + 0.382799340 * y - 0.047570458 * z)
    mp = pq(0.149284160 * x + 0.739628340 * y + 0.083327300 * z)
    sp = pq(0.070941080 * x + 0.174768000 * y + 0.670970020 * z)
    iz = 0.5 * (lp + mp)
    az = 3.524000 * lp - 4.066708 * mp + 0.542708 * sp
    bz = 0.199076 * lp + 1.096799 * mp - 1.295875 * sp
    jz = (0.44 * iz) / (1.0 - 0.56 * iz) - 1.6295499532821566e-11
    return jz, az, bz


def _jzazbz_inv(jz, az, bz, P):
    """(jz, az, bz) -> working RGB; P indexes params (iws at 9..17)."""
    jz = jz + 1.6295499532821566e-11
    iz = jz / (0.44 + 0.56 * jz)
    l = jzazbz._pq_inv(
        iz + 1.386050432715393e-1 * az + 5.804731615611869e-2 * bz)
    m = jzazbz._pq_inv(
        iz - 1.386050432715393e-1 * az - 5.804731615611891e-2 * bz)
    s = jzazbz._pq_inv(
        iz - 9.601924202631895e-2 * az - 8.118918960560390e-1 * bz)
    x = (1.661373055774069e+00 * l - 9.145230923250668e-01 * m
         + 2.313620767186147e-01 * s)
    y = (-3.250758740427037e-01 * l + 1.571847038366936e+00 * m
         - 2.182538318672940e-01 * s)
    z = (-9.098281098284756e-02 * l - 3.127282905230740e-01 * m
         + 1.522766561305260e+00 * s)
    mm = jzazbz._D65_TO_D50
    x, y, z = (
        float(mm[0, 0]) * x + float(mm[0, 1]) * y + float(mm[0, 2]) * z,
        float(mm[1, 0]) * x + float(mm[1, 1]) * y + float(mm[1, 2]) * z,
        float(mm[2, 0]) * x + float(mm[2, 1]) * y + float(mm[2, 2]) * z)
    r = P[9] * x + P[10] * y + P[11] * z
    g = P[12] * x + P[13] * y + P[14] * z
    b = P[15] * x + P[16] * y + P[17] * z
    return r, g, b


def _gauss(x, b, c):
    return jnp.exp(-((x - b) ** 2) / (2.0 * c * c))


def _filmlike_clip3(r, g, b, lmax):
    """Hue-stable highlight clip (color.cc:6662-6688) on 3 planes."""
    hi = jnp.maximum(jnp.maximum(r, g), b)
    lo = jnp.minimum(jnp.minimum(r, g), b)
    mid = r + g + b - hi - lo
    hi_c = jnp.minimum(hi, lmax)
    lo_c = jnp.minimum(lo, lmax)
    denom = hi - lo
    mid_c = jnp.where(
        denom > 0,
        lo_c + (hi_c - lo_c) * (mid - lo) / jnp.where(denom > 0, denom, 1.0),
        hi_c)

    def pick(ch):
        return jnp.where(ch >= hi, hi_c, jnp.where(ch <= lo, lo_c, mid_c))

    return pick(r), pick(g), pick(b)


def _neutral_core(r, g, b, P, curve_fn):
    """The whole neutral-mode transform on three same-shape planes.

    P: indexable params vector (43 scalars, layout from plan_neutral);
    curve_fn: the composed tone curve on [0,1]. Inputs/outputs in the
    0..MAXVAL domain.
    """
    rhue, bhue, yhue = P[36], P[37], P[38]
    rrange, brange, yrange = P[39], P[40], P[41]
    whitept = P[42]
    lmax = whitept * MAXVAL

    r = jnp.maximum(r * (1.0 / MAXVAL), 0.0)
    g = jnp.maximum(g * (1.0 / MAXVAL), 0.0)
    b = jnp.maximum(b * (1.0 / MAXVAL), 0.0)
    ilum, az1, bz1 = _jzazbz_fwd(r, g, b, P)
    cz1 = jnp.sqrt(az1 * az1 + bz1 * bz1)
    hue0 = _atan2_poly(az1, bz1)
    iy = (r + g + b) * (1.0 / 3.0)

    # gamut compression in output space (to_out at P[18..26])
    o0 = P[18] * r + P[19] * g + P[20] * b
    o1 = P[21] * r + P[22] * g + P[23] * b
    o2 = P[24] * r + P[25] * g + P[26] * b
    ac = jnp.maximum(jnp.maximum(o0, o1), o2)
    aac = jnp.abs(ac)
    safe = jnp.where(aac > 0, aac, 1.0)
    outs = []
    for c, oc in enumerate((o0, o1, o2)):
        d = jnp.where(ac != 0, (ac - oc) / safe, 0.0)
        th = float(_TH[c])
        s = float(_S[c])
        compr = (s * jnp.sqrt(jnp.maximum(d - th, 0.0) + s * s / 4.0)
                 - s * np.sqrt(s * s / 4.0) + th)
        cd = jnp.where(d < th, d, compr)
        outs.append(ac - cd * aac)
    o0, o1, o2 = outs
    # back to working space (to_work at P[27..35])
    r = P[27] * o0 + P[28] * o1 + P[29] * o2
    g = P[30] * o0 + P[31] * o1 + P[32] * o2
    b = P[33] * o0 + P[34] * o1 + P[35] * o2

    # brightness-preserving normalization + filmlike clip
    oy = (r + g + b) * (1.0 / 3.0)
    f = jnp.where(oy > 0, iy / jnp.where(oy > 0, oy, 1.0), 1.0)
    r, g, b = r * f, g * f, b * f
    r, g, b = _filmlike_clip3(r, g, b, whitept)

    # apply the composed curve per channel (domain 0..1, sqrt warp)
    r = curve_fn(r)
    g = curve_fn(g)
    b = curve_fn(b)

    jz, az2, bz2 = _jzazbz_fwd(r, g, b, P)
    cz = jnp.sqrt(az2 * az2 + bz2 * bz2)

    # hue twists (curves.cc:1000-1010)
    hue_shift = 15.0 * (np.pi / 180.0) * _gauss(hue0, rhue, rrange)
    hue_shift = (hue_shift
                 - 5.0 * (np.pi / 180.0) * _gauss(hue0, bhue, brange))
    hue_shift = hue_shift * jnp.clip(
        (r + g + b) / (3.0 * whitept), 0.0, 1.0)
    hue = hue0 + hue_shift

    # saturation compensation
    ccf = jnp.where(
        ilum > 1e-5,
        1.0 - jnp.clip(jz / jnp.maximum(ilum, 1e-5) - 1.0, 0.0, 1.0) * 0.2,
        1.0)
    ccf = jnp.clip(ccf + 0.5 * _gauss(hue, yhue, yrange), 0.0, 1.0)

    # rotate the pre-curve chroma direction (az1, bz1) by hue_shift and
    # rescale to the post-curve chroma cz*ccf — algebraically identical to
    # sat*sin/cos(atan2(az1,bz1)+shift) without the large-angle sin/cos
    sin_d, cos_d = _sincos_small(hue_shift)
    inv_c1 = jnp.where(cz1 > 1e-20, 1.0 / jnp.maximum(cz1, 1e-20), 0.0)
    scale = cz * ccf * inv_c1
    az = scale * (az1 * cos_d + bz1 * sin_d)
    bz = scale * (bz1 * cos_d - az1 * sin_d)

    r, g, b = _jzazbz_inv(jz, az, bz, P)
    r = jnp.clip(r * MAXVAL, 0.0, lmax)
    g = jnp.clip(g * MAXVAL, 0.0, lmax)
    b = jnp.clip(b * MAXVAL, 0.0, lmax)
    return r, g, b


# ---------------------------------------------------------------------------
# Pallas kernel: halo-free tiles, params + curve coefficients in SMEM

def _curve_fn_from_scalars(coeffs_ref, shape):
    """Build the tone-curve eval from SMEM scalar reads: (2, K) = even/odd
    Horner split (fit_curve_split), (1, D) = Chebyshev Clenshaw."""
    if shape[0] == 2:
        pk = [coeffs_ref[0, k] for k in range(shape[1])]
        qk = [coeffs_ref[1, k] for k in range(shape[1])]

        def curve(x):
            t = 2.0 * jnp.sqrt(jnp.clip(x, 0.0, 1.0)) - 1.0
            u = 2.0 * t * t - 1.0
            accp = jnp.full_like(t, pk[0])
            for c in pk[1:]:
                accp = accp * u + c
            accq = jnp.full_like(t, qk[0])
            for c in qk[1:]:
                accq = accq * u + c
            return accp + t * accq

        return curve
    cks = [coeffs_ref[0, k] for k in range(shape[1])]
    return lambda x: _clenshaw_sqrtwarp(x, cks)


def _epilogue(r, g, b, W, trc):
    """rgb2out fused into the kernel tail: working -> output primaries,
    clip to [0,1], TRC encode (develop.py rgb2out). W: 9 scalars
    (work2out row-major); trc: static ("srgb"/"linear", arg) spec."""
    inv = 1.0 / MAXVAL
    o0 = (W[0] * r + W[1] * g + W[2] * b) * inv
    o1 = (W[3] * r + W[4] * g + W[5] * b) * inv
    o2 = (W[6] * r + W[7] * g + W[8] * b) * inv
    out = []
    for o in (o0, o1, o2):
        o = jnp.clip(o, 0.0, 1.0)
        if trc[0] == "srgb":
            o = cs.srgb_gamma(o, jnp)
        out.append(o)
    return out


def _neutral_kernel(params_ref, coeffs_ref, x_ref, o_ref, *, cshape, epi):
    n = 52 if epi else 43
    P = [params_ref[0, i] for i in range(n)]
    curve_fn = _curve_fn_from_scalars(coeffs_ref, cshape)
    r, g, b = _neutral_core(x_ref[0], x_ref[1], x_ref[2], P, curve_fn)
    if epi:
        r, g, b = _epilogue(r, g, b, P[43:52], epi)
    o_ref[0] = r
    o_ref[1] = g
    o_ref[2] = b


def _pick_tile(n, opts):
    for t in opts:
        if n % t == 0:
            return t
    return None


def _pick_tx(w, ty):
    """Lane-dim tile. Measured on v5e at the 24MP bench shape (4096x6016,
    fused rgb2out epilogue): 256x128 tiles run 11.96 ms/frame while
    full-width 6016-lane tiles are ~2x slower (20.6-22.6 ms at ty in
    32..128) and at ty=256 exceed VMEM outright — 2x35.25M double-
    buffered in+out windows plus 95.66M register-spill slots from the
    ~16-plane live set = 166M vs the 128M budget. Small lane tiles keep
    the whole live set in registers; the per-tile grid/DMA prologue the
    full-width variant tried to avoid is noise by comparison."""
    return _pick_tile(w, (128, 256, 512))


@functools.partial(jax.jit,
                   static_argnames=("cshape", "epi", "interpret"))
def _run_neutral_pallas(rgb, params, coeffs, cshape, epi=None,
                        interpret=False):
    _, h, w = rgb.shape
    ty = _pick_tile(h, (128, 256))
    tx = _pick_tx(w, ty)
    grid = (h // ty, w // tx)
    return pl.pallas_call(
        functools.partial(_neutral_kernel, cshape=cshape, epi=epi),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((3, ty, tx), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, ty, tx), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rgb.shape, rgb.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(params.reshape(1, -1), coeffs.reshape(cshape), rgb)


def apply_neutral(rgb, data, static):
    coeffs = data["coeffs"]
    params = data["params"]
    # fused rgb2out epilogue: develop passes the work2out matrix in data
    # and the static output TRC spec as a trailing ("epi", trc) entry
    epi = None
    if static and isinstance(static[-1], tuple) and static[-1][0] == "epi":
        epi = static[-1][1]
        params = jnp.concatenate([
            jnp.asarray(params, jnp.float32).reshape(-1),
            jnp.asarray(data["out_mat"], jnp.float32).reshape(-1)])
    seg = coeffs.ndim == 2 and coeffs.shape[0] not in (1, 2)
    if not seg and rgb.ndim == 3:
        _, h, w = rgb.shape
        ty = _pick_tile(h, (128, 256))
        if ty and _pick_tx(w, ty):
            interpret = jax.default_backend() not in ("tpu", "axon")
            cshape = ((1, int(coeffs.shape[0])) if coeffs.ndim == 1
                      else tuple(int(d) for d in coeffs.shape))
            return _run_neutral_pallas(rgb, params, coeffs, cshape,
                                       epi=epi, interpret=interpret)

    # whole-plane XLA fallback (segment-represented curves, odd shapes)
    P = [params[i] for i in range(52 if epi else 43)]
    if seg:
        from art_tpu.core.curve1d import eval_curve

        curve_fn = lambda x: eval_curve(x, coeffs, in_max=1.0, out_max=1.0)
    elif coeffs.ndim == 2:
        from art_tpu.core.curve1d import eval_split

        curve_fn = lambda x: eval_split(x, coeffs)
    else:
        cks = [coeffs[k] for k in range(int(coeffs.shape[0]))]
        curve_fn = lambda x: _clenshaw_sqrtwarp(x, cks)
    r, g, b = _neutral_core(rgb[0], rgb[1], rgb[2], P, curve_fn)
    if epi:
        r, g, b = _epilogue(r, g, b, P[43:52], epi)
    return jnp.stack([r, g, b])
