"""AMaZE demosaic — TPU whole-plane formulation.

Reference: ``rtengine/amaze_demosaic_RT.cc`` (Emil Martinec's AMaZE,
1596 LoC of tiled OpenMP+SSE2). The reference processes 160x160 tiles with
16px halos; every per-pixel branch becomes a `where` select here and every
half-index ("indx>>1") quincunx array becomes a full plane consumed at the
right parity — the whole kernel is one fused XLA stencil program.

Stages (as in the reference):
1. directional gradients dirwts0/1 + delhvsqsum
2. cardinal color ratios + Hamilton-Adams and adaptive-ratio G estimates,
   vcd/hcd color differences (+ alt variants), clip guards
3. variance-based selection of cd estimates, saturation bounding
4. directional discrimination hvwt from cd variances + interp fluctuations
5. Nyquist texture test (gaussian-weighted cd-vs-gradient comparison),
   majority vote, area interpolation inside Nyquist regions
6. G at R/B sites; local G curvature; Nyquist refinement
7. diagonal (plus/minus) R/B interpolation with ratio correction and
   saturation bounding; pmwt discrimination; G correction where diagonal
   discrimination beats cardinal
8. chrominance: Dgrb (G-R, G-B) propagated diagonally to the opposite
   coset, then to G sites with hvwt weights
Borders (16 px) fall back to RCD.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.image import bayer_channel_masks
from art_tpu.demosaic.registry import register

EPS = 1e-5
EPSSQ = 1e-10
ARTHRESH = 0.75
NYQTHRESH = 0.5

GAUSSODD = (0.14659727707323927, 0.103592713382435,
            0.0732036125103057, 0.0365543548389495)
GAUSSGRAD = tuple(NYQTHRESH * g for g in (
    0.07384411893421103, 0.06207511968171489, 0.0521818194747806,
    0.03687419286733595, 0.03099732204057846, 0.018413194161458882))
GAUSSEVEN = (0.13719494435797422, 0.05640252782101291)
GQUINC = (0.169917, 0.108947, 0.069855, 0.0287182)

BORDER = 16


def _med3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


class _Shifter:
    """shift(dy, dx) = value at (y+dy, x+dx) via jnp.roll.

    Roll wraps at the borders; validity shrinks by the cumulative shift
    amount, which stays inside the HALO margin (whole-plane path pads by
    HALO and the Pallas path reads halo windows). Rolls compile to
    concat-of-slices on TPU — no padded copies per stage.
    """

    def __init__(self, x, r=None):
        self.x = x

    def __call__(self, dy, dx):
        if dy == 0 and dx == 0:
            return self.x
        out = self.x
        if dy != 0:
            out = jnp.roll(out, -dy, axis=0)
        if dx != 0:
            out = jnp.roll(out, -dx, axis=1)
        return out


HALO = 24  # cumulative stencil reach of the stage chain


def _make_rcp(fast):
    """Reciprocals for the stage math. fast=True (Pallas TPU path only)
    uses the VPU's approximate reciprocal: ~40 divides/pixel across the
    stage chain are the single largest VPU cost, and the full-precision
    divide sequence is ~3x the estimate's cost. Returns (rcp, rcp_w):
    `rcp` refines with one Newton step (rel err ~1e-7) and guards every
    value-bearing ratio; `rcp_w` is the raw estimate (~2e-4) for blend
    weights, where the error only perturbs an interpolation factor.
    The whole-plane XLA path keeps exact division (golden comparisons).
    """
    if not fast:
        exact = lambda d: 1.0 / d
        return exact, exact
    from jax.experimental import pallas as pl

    def rcp(d):
        r = pl.reciprocal(d, approx=True)
        return r * (2.0 - d * r)

    def rcp_w(d):
        return pl.reciprocal(d, approx=True)

    return rcp, rcp_w


def _amaze_core(x, mr, mg, mb, clip_pt, clip_pt8,
                _skip_diag=False, _skip_nyq=False):
    """All AMaZE stages on a normalized window with roll shifts."""
    vcd, hcd, hvwt = _stages_1to4(x, mg, clip_pt, clip_pt8)
    green, hvwt = _stages_5to6(x, mg, vcd, hcd, hvwt, _skip_nyq=_skip_nyq)
    return _stages_7to8(x, mr, mg, mb, green, hvwt, clip_pt,
                        _skip_diag=_skip_diag)


def _stages_1to4(x, mg, clip_pt, clip_pt8, fast=False):
    """Stages 1-4: directional cd estimates + hvwt discrimination.

    Stencil reach ~9; returns (vcd, hcd, hvwt). This is the first Pallas
    stage kernel — the cross-kernel state is just these three planes.
    """
    rcp, rcp_w = _make_rcp(fast)
    s = _Shifter(x, 4)

    # ---- stage 1: gradients -------------------------------------------------
    delh = jnp.abs(s(0, 1) - s(0, -1))
    delv = jnp.abs(s(1, 0) - s(-1, 0))
    dirwts0 = EPS + jnp.abs(s(2, 0) - x) + jnp.abs(x - s(-2, 0)) + delv
    dirwts1 = EPS + jnp.abs(s(0, 2) - x) + jnp.abs(x - s(0, -2)) + delh
    delhvsqsum = delh * delh + delv * delv

    sd0 = _Shifter(dirwts0, 2)
    sd1 = _Shifter(dirwts1, 2)

    # ---- stage 2: cardinal G estimates + color differences ------------------
    cru = s(-1, 0) * (sd0(-2, 0) + dirwts0) * rcp(
        sd0(-2, 0) * (EPS + x) + dirwts0 * (EPS + s(-2, 0)))
    crd = s(1, 0) * (sd0(2, 0) + dirwts0) * rcp(
        sd0(2, 0) * (EPS + x) + dirwts0 * (EPS + s(2, 0)))
    crl = s(0, -1) * (sd1(0, -2) + dirwts1) * rcp(
        sd1(0, -2) * (EPS + x) + dirwts1 * (EPS + s(0, -2)))
    crr = s(0, 1) * (sd1(0, 2) + dirwts1) * rcp(
        sd1(0, 2) * (EPS + x) + dirwts1 * (EPS + s(0, 2)))

    guha = s(-1, 0) + 0.5 * (x - s(-2, 0))
    gdha = s(1, 0) + 0.5 * (x - s(2, 0))
    glha = s(0, -1) + 0.5 * (x - s(0, -2))
    grha = s(0, 1) + 0.5 * (x - s(0, 2))

    guar = jnp.where(jnp.abs(1.0 - cru) < ARTHRESH, x * cru, guha)
    gdar = jnp.where(jnp.abs(1.0 - crd) < ARTHRESH, x * crd, gdha)
    glar = jnp.where(jnp.abs(1.0 - crl) < ARTHRESH, x * crl, glha)
    grar = jnp.where(jnp.abs(1.0 - crr) < ARTHRESH, x * crr, grha)

    hwt = sd1(0, -1) * rcp_w(sd1(0, -1) + sd1(0, 1))
    vwt = sd0(-1, 0) * rcp_w(sd0(1, 0) + sd0(-1, 0))

    gintvha = vwt * gdha + (1.0 - vwt) * guha
    ginthha = hwt * grha + (1.0 - hwt) * glha

    sgn = jnp.where(mg, -1.0, 1.0)  # cd is G-minus-other at every site
    vcd = sgn * ((vwt * gdar + (1.0 - vwt) * guar) - x)
    hcd = sgn * ((hwt * grar + (1.0 - hwt) * glar) - x)
    vcdalt = sgn * (gintvha - x)
    hcdalt = sgn * (ginthha - x)

    clipmask = (x > clip_pt8) | (gintvha > clip_pt8) | (ginthha > clip_pt8)
    guar = jnp.where(clipmask, guha, guar)
    gdar = jnp.where(clipmask, gdha, gdar)
    glar = jnp.where(clipmask, glha, glar)
    grar = jnp.where(clipmask, grha, grar)
    vcd = jnp.where(clipmask, vcdalt, vcd)
    hcd = jnp.where(clipmask, hcdalt, hcd)

    dgintv = jnp.minimum((guha - gdha) ** 2, (guar - gdar) ** 2)
    dginth = jnp.minimum((glha - grha) ** 2, (glar - grar) ** 2)

    # ---- stage 3: variance-based selection + saturation bounding ------------
    svc = _Shifter(vcd, 2)
    shc = _Shifter(hcd, 2)
    svca = _Shifter(vcdalt, 2)
    shca = _Shifter(hcdalt, 2)

    def _var3(c_m, c_0, c_p):
        return 3.0 * (c_m * c_m + c_0 * c_0 + c_p * c_p) - (
            c_m + c_0 + c_p) ** 2

    hcdvar = _var3(shc(0, -2), hcd, shc(0, 2))
    hcdaltvar = _var3(shca(0, -2), hcdalt, shca(0, 2))
    vcdvar = _var3(svc(-2, 0), vcd, svc(2, 0))
    vcdaltvar = _var3(svca(-2, 0), vcdalt, svca(2, 0))

    hcd = jnp.where(hcdaltvar < hcdvar, hcdalt, hcd)
    vcd = jnp.where(vcdaltvar < vcdvar, vcdalt, vcd)

    # bounding: G sites have cd = G - interp(other); R/B have cd = Gint - cfa
    def _bound_g_site(cd, n_m, n_p):
        gint_other = x - cd  # interpolated R/B at this G site
        med = _med3(gint_other, n_m, n_p)
        strong = 3.0 * cd > (gint_other + x)
        wt = 1.0 - 3.0 * cd * rcp_w(EPS + gint_other + x)
        blended = wt * cd + (1.0 - wt) * (x - med)
        out = jnp.where(cd > 0, jnp.where(strong, x - med, blended), cd)
        return jnp.where(gint_other > clip_pt, x - med, out)

    def _bound_rb_site(cd, n_m, n_p):
        gint = cd + x
        med = _med3(gint, n_m, n_p)
        strong = 3.0 * cd < -(gint + x)
        wt = 1.0 + 3.0 * cd * rcp_w(EPS + gint + x)
        blended = wt * cd + (1.0 - wt) * (med - x)
        out = jnp.where(cd < 0, jnp.where(strong, med - x, blended), cd)
        return jnp.where(gint > clip_pt, med - x, out)

    hcd = jnp.where(mg, _bound_g_site(hcd, s(0, -1), s(0, 1)),
                    _bound_rb_site(hcd, s(0, -1), s(0, 1)))
    vcd = jnp.where(mg, _bound_g_site(vcd, s(-1, 0), s(1, 0)),
                    _bound_rb_site(vcd, s(-1, 0), s(1, 0)))

    # ---- stage 4: directional discrimination hvwt (R/B sites) ---------------
    svc = _Shifter(vcd, 3)
    shc = _Shifter(hcd, 3)
    uave = vcd + svc(-1, 0) + svc(-2, 0) + svc(-3, 0)
    dave = vcd + svc(1, 0) + svc(2, 0) + svc(3, 0)
    lave = hcd + shc(0, -1) + shc(0, -2) + shc(0, -3)
    rave = hcd + shc(0, 1) + shc(0, 2) + shc(0, 3)
    # NOTE: reference sums raw deviations without the /4 mean; replicate.
    dgrbvvaru = ((vcd - uave) ** 2 + (svc(-1, 0) - uave) ** 2
                 + (svc(-2, 0) - uave) ** 2 + (svc(-3, 0) - uave) ** 2)
    dgrbvvard = ((vcd - dave) ** 2 + (svc(1, 0) - dave) ** 2
                 + (svc(2, 0) - dave) ** 2 + (svc(3, 0) - dave) ** 2)
    dgrbhvarl = ((hcd - lave) ** 2 + (shc(0, -1) - lave) ** 2
                 + (shc(0, -2) - lave) ** 2 + (shc(0, -3) - lave) ** 2)
    dgrbhvarr = ((hcd - rave) ** 2 + (shc(0, 1) - rave) ** 2
                 + (shc(0, 2) - rave) ** 2 + (shc(0, 3) - rave) ** 2)

    vcdvar_d = EPSSQ + vwt * dgrbvvard + (1.0 - vwt) * dgrbvvaru
    hcdvar_d = EPSSQ + hwt * dgrbhvarr + (1.0 - hwt) * dgrbhvarl

    sgv = _Shifter(dgintv, 2)
    sgh = _Shifter(dginth, 2)
    fluctv_u = dgintv + sgv(-1, 0) + sgv(-2, 0)
    fluctv_d = dgintv + sgv(1, 0) + sgv(2, 0)
    flucth_l = dginth + sgh(0, -1) + sgh(0, -2)
    flucth_r = dginth + sgh(0, 1) + sgh(0, 2)
    vcdvar1 = EPSSQ + vwt * fluctv_d + (1.0 - vwt) * fluctv_u
    hcdvar1 = EPSSQ + hwt * flucth_r + (1.0 - hwt) * flucth_l

    varwt = hcdvar_d * rcp_w(vcdvar_d + hcdvar_d)
    diffwt = hcdvar1 * rcp_w(vcdvar1 + hcdvar1)
    agree = ((0.5 - varwt) * (0.5 - diffwt) > 0) & (
        jnp.abs(0.5 - diffwt) < jnp.abs(0.5 - varwt))
    hvwt = jnp.where(agree, varwt, diffwt)
    return vcd, hcd, hvwt


def _stages_5to6(x, mg, vcd, hcd, hvwt, _skip_nyq=False, fast=False):
    """Stages 5-6: Nyquist texture handling + G at R/B sites.

    Stencil reach ~10 (area stats out to +-6 over the nyquist flags);
    returns (green, hvwt) with the stage-6 hvwt smoothing applied.
    """
    rcp, rcp_w = _make_rcp(fast)
    m_rb = ~mg
    s = _Shifter(x, 4)
    delh = jnp.abs(s(0, 1) - s(0, -1))
    delv = jnp.abs(s(1, 0) - s(-1, 0))
    delhvsqsum = delh * delh + delv * delv
    cddiffsq = (vcd - hcd) ** 2

    # ---- stage 5: Nyquist test ----------------------------------------------
    scd = _Shifter(cddiffsq, 2)
    sds = _Shifter(delhvsqsum, 2)
    nyqutest = (
        GAUSSODD[0] * cddiffsq
        + GAUSSODD[1] * (scd(-1, -1) + scd(-1, 1) + scd(1, -1) + scd(1, 1))
        + GAUSSODD[2] * (scd(-2, 0) + scd(0, -2) + scd(0, 2) + scd(2, 0))
        + GAUSSODD[3] * (scd(-2, -2) + scd(-2, 2) + scd(2, -2) + scd(2, 2))
    ) - (
        GAUSSGRAD[0] * delhvsqsum
        + GAUSSGRAD[1] * (sds(-1, 0) + sds(0, 1) + sds(0, -1) + sds(1, 0))
        + GAUSSGRAD[2] * (sds(-1, -1) + sds(-1, 1) + sds(1, -1) + sds(1, 1))
        + GAUSSGRAD[3] * (sds(-2, 0) + sds(0, -2) + sds(0, 2) + sds(2, 0))
        + GAUSSGRAD[4] * (sds(-2, -1) + sds(-2, 1) + sds(-1, -2) + sds(-1, 2)
                          + sds(1, -2) + sds(1, 2) + sds(2, -1) + sds(2, 1))
        + GAUSSGRAD[5] * (sds(-2, -2) + sds(-2, 2) + sds(2, -2) + sds(2, 2))
    )
    # float-valued flags: Mosaic rejects bool select chains (i1 trunc)
    m_rbf = jnp.where(m_rb, 1.0, 0.0)
    nyqf = jnp.where(nyqutest > 0.0, 1.0, 0.0) * m_rbf

    sny = _Shifter(nyqf, 2)
    nyqsum = (sny(-2, 0) + sny(-1, -1) + sny(-1, 1) + sny(0, -2)
              + sny(0, 2) + sny(1, -1) + sny(1, 1) + sny(2, 0))
    ny2f = jnp.where(nyqsum > 4, 1.0,
                     jnp.where(nyqsum < 4, 0.0, nyqf)) * m_rbf
    if _skip_nyq:
        ny2f = ny2f * 0.0
    nyquist2 = ny2f > 0.5
    cfah = s(0, -1) + s(0, 1)
    cfav = s(-1, 0) + s(1, 0)
    sqh = (x - s(0, -1)) ** 2 + (x - s(0, 1)) ** 2
    sqv = (x - s(-1, 0)) ** 2 + (x - s(1, 0)) ** 2
    # 7x7 quincunx box sums, separable rows-then-cols with a log-tree per
    # dim: 7 step-2 taps = 4+2+1 partial sums (4 shifts + 3 adds instead
    # of 6 shifts + 6 adds; u1/u2 cover {0,2}/{0,2,4,6}, +{8,10}, +{12},
    # recentered by +6)
    def _sum7(v, axis):
        def r(z, d):
            return jnp.roll(z, -d, axis=axis)

        u1 = v + r(v, 2)
        u2 = u1 + r(u1, 4)
        s = u2 + r(u1, 8) + r(v, 12)
        return jnp.roll(s, 6, axis=axis)

    def _area_sum(a):
        return _sum7(_sum7(a, 0), 1)

    sumcfa = _area_sum(x * ny2f)
    sumh = _area_sum(cfah * ny2f)
    sumv = _area_sum(cfav * ny2f)
    sumsqh = _area_sum(sqh * ny2f)
    sumsqv = _area_sum(sqv * ny2f)
    areawt = _area_sum(ny2f)
    sumh = sumcfa - 0.5 * sumh
    sumv = sumcfa - 0.5 * sumv
    areawt = 0.5 * areawt
    hcdvar_a = EPSSQ + jnp.abs(areawt * sumsqh - sumh * sumh)
    vcdvar_a = EPSSQ + jnp.abs(areawt * sumsqv - sumv * sumv)
    hvwt = jnp.where(nyquist2, hcdvar_a * rcp_w(vcdvar_a + hcdvar_a), hvwt)

    # ---- stage 6: G at R/B sites --------------------------------------------
    shv = _Shifter(hvwt, 1)
    hvwtalt = 0.25 * (shv(-1, -1) + shv(-1, 1) + shv(1, -1) + shv(1, 1))
    hvwt = jnp.where(jnp.abs(0.5 - hvwt) < jnp.abs(0.5 - hvwtalt),
                     hvwtalt, hvwt)

    dgrb0 = hvwt * vcd + (1.0 - hvwt) * hcd  # G-minus-other at R/B sites
    green = jnp.where(m_rb, x + dgrb0, x)

    sgrn = _Shifter(green, 1)
    curv_h = jnp.where(
        nyquist2, (green - 0.5 * (sgrn(0, -1) + sgrn(0, 1))) ** 2, 0.0)
    curv_v = jnp.where(
        nyquist2, (green - 0.5 * (sgrn(-1, 0) + sgrn(1, 0))) ** 2, 0.0)

    sch = _Shifter(curv_h, 2)
    scv = _Shifter(curv_v, 2)

    def _gquinc_avg(sq):
        return (GQUINC[0] * sq(0, 0)
                + GQUINC[1] * (sq(-1, -1) + sq(-1, 1) + sq(1, -1) + sq(1, 1))
                + GQUINC[2] * (sq(-2, 0) + sq(0, -2) + sq(0, 2) + sq(2, 0))
                + GQUINC[3] * (sq(-2, -2) + sq(-2, 2) + sq(2, -2)
                               + sq(2, 2)))

    gvarh = EPSSQ + _gquinc_avg(sch)
    gvarv = EPSSQ + _gquinc_avg(scv)
    dgrb0 = jnp.where(nyquist2,
                      (hcd * gvarv + vcd * gvarh) * rcp(gvarv + gvarh),
                      dgrb0)
    green = jnp.where(m_rb, x + dgrb0, green)
    return green, hvwt


def _stages_7to8(x, mr, mg, mb, green, hvwt, clip_pt, _skip_diag=False,
                 fast=False):
    """Stages 7-8: diagonal R/B interpolation + chrominance.

    dgrb0 is recovered as green - x (exact at R/B sites); dirwts are
    recomputed from x (cheaper than carrying them across kernels).
    Stencil reach ~11; returns the (3, H, W) RGB stack in 0..65535.
    """
    rcp, rcp_w = _make_rcp(fast)
    m_rb = ~mg
    s = _Shifter(x, 4)
    delh = jnp.abs(s(0, 1) - s(0, -1))
    delv = jnp.abs(s(1, 0) - s(-1, 0))
    dirwts0 = EPS + jnp.abs(s(2, 0) - x) + jnp.abs(x - s(-2, 0)) + delv
    dirwts1 = EPS + jnp.abs(s(0, 2) - x) + jnp.abs(x - s(0, -2)) + delh
    sd0 = _Shifter(dirwts0, 2)
    sd1 = _Shifter(dirwts1, 2)
    dgrb0 = green - x

    # ---- stage 7: diagonal R/B interpolation --------------------------------
    # delp/delm at R/B sites; Dgrbsq1p/m at G sites (natural-site planes)
    delp = jnp.abs(s(-1, 1) - s(1, -1))
    delm = jnp.abs(s(1, 1) - s(-1, -1))
    dgrbsq1p = (x - s(1, -1)) ** 2 + (x - s(-1, 1)) ** 2
    dgrbsq1m = (x - s(-1, -1)) ** 2 + (x - s(1, 1)) ** 2

    crse = 2.0 * s(1, 1) * rcp(EPS + x + s(2, 2))
    crnw = 2.0 * s(-1, -1) * rcp(EPS + x + s(-2, -2))
    crne = 2.0 * s(-1, 1) * rcp(EPS + x + s(-2, 2))
    crsw = 2.0 * s(1, -1) * rcp(EPS + x + s(2, -2))

    rbse = jnp.where(jnp.abs(1.0 - crse) < ARTHRESH, x * crse,
                     s(1, 1) + 0.5 * (x - s(2, 2)))
    rbnw = jnp.where(jnp.abs(1.0 - crnw) < ARTHRESH, x * crnw,
                     s(-1, -1) + 0.5 * (x - s(-2, -2)))
    rbne = jnp.where(jnp.abs(1.0 - crne) < ARTHRESH, x * crne,
                     s(-1, 1) + 0.5 * (x - s(-2, 2)))
    rbsw = jnp.where(jnp.abs(1.0 - crsw) < ARTHRESH, x * crsw,
                     s(1, -1) + 0.5 * (x - s(2, -2)))

    sdm = _Shifter(delm, 2)
    sdp = _Shifter(delp, 2)
    wtse = EPS + delm + sdm(1, 1) + sdm(2, 2)
    wtnw = EPS + delm + sdm(-1, -1) + sdm(-2, -2)
    wtne = EPS + delp + sdp(-1, 1) + sdp(-2, 2)
    wtsw = EPS + delp + sdp(1, -1) + sdp(2, -2)

    rbm = (wtse * rbnw + wtnw * rbse) * rcp(wtse + wtnw)
    rbp = (wtne * rbsw + wtsw * rbne) * rcp(wtne + wtsw)

    sq1m = _Shifter(dgrbsq1m, 3)
    sq1p = _Shifter(dgrbsq1p, 3)
    rbvarm = EPSSQ + (
        GAUSSEVEN[0] * (sq1m(-1, 0) + sq1m(0, -1) + sq1m(0, 1) + sq1m(1, 0))
        + GAUSSEVEN[1] * (sq1m(-2, -1) + sq1m(-2, 1) + sq1m(-1, -2)
                          + sq1m(-1, 2) + sq1m(1, -2) + sq1m(1, 2)
                          + sq1m(2, -1) + sq1m(2, 1)))
    rbvarp = EPSSQ + (
        GAUSSEVEN[0] * (sq1p(-1, 0) + sq1p(0, -1) + sq1p(0, 1) + sq1p(1, 0))
        + GAUSSEVEN[1] * (sq1p(-2, -1) + sq1p(-2, 1) + sq1p(-1, -2)
                          + sq1p(-1, 2) + sq1p(1, -2) + sq1p(1, 2)
                          + sq1p(2, -1) + sq1p(2, 1)))
    pmwt = rbvarm * rcp_w(rbvarp + rbvarm)

    # saturation bounding of rbp/rbm
    def _bound_rb(rb, n_m, n_p):
        med = _med3(rb, n_m, n_p)
        strong = 2.0 * rb < x
        wt = 2.0 * (x - rb) * rcp_w(EPS + rb + x)
        blended = wt * rb + (1.0 - wt) * med
        out = jnp.where(rb < x, jnp.where(strong, med, blended), rb)
        return jnp.where(out > clip_pt, _med3(out, n_m, n_p), out)

    rbp = _bound_rb(rbp, s(1, -1), s(-1, 1))
    rbm = _bound_rb(rbm, s(-1, -1), s(1, 1))

    spm = _Shifter(pmwt, 1)
    pmwtalt = 0.25 * (spm(-1, -1) + spm(-1, 1) + spm(1, -1) + spm(1, 1))
    pmwt = jnp.where(jnp.abs(0.5 - pmwt) < jnp.abs(0.5 - pmwtalt),
                     pmwtalt, pmwt)
    rbint = 0.5 * (x + rbm * (1.0 - pmwt) + rbp * pmwt)

    # G correction where diagonal discrimination is stronger.
    # NOTE: the reference's rbint[indx1 +- v1/1] are HALF-index offsets —
    # they address the same-coset R/B site 2 rows/cols away.
    sri = _Shifter(rbint, 2)
    cru2 = s(-1, 0) * 2.0 * rcp(EPS + rbint + sri(-2, 0))
    crd2 = s(1, 0) * 2.0 * rcp(EPS + rbint + sri(2, 0))
    crl2 = s(0, -1) * 2.0 * rcp(EPS + rbint + sri(0, -2))
    crr2 = s(0, 1) * 2.0 * rcp(EPS + rbint + sri(0, 2))
    gu = jnp.where(jnp.abs(1.0 - cru2) < ARTHRESH, rbint * cru2,
                   s(-1, 0) + 0.5 * (rbint - sri(-2, 0)))
    gd = jnp.where(jnp.abs(1.0 - crd2) < ARTHRESH, rbint * crd2,
                   s(1, 0) + 0.5 * (rbint - sri(2, 0)))
    gl = jnp.where(jnp.abs(1.0 - crl2) < ARTHRESH, rbint * crl2,
                   s(0, -1) + 0.5 * (rbint - sri(0, -2)))
    gr = jnp.where(jnp.abs(1.0 - crr2) < ARTHRESH, rbint * crr2,
                   s(0, 1) + 0.5 * (rbint - sri(0, 2)))

    gintv = (sd0(-1, 0) * gd + sd0(1, 0) * gu) * rcp(sd0(1, 0) + sd0(-1, 0))
    ginth = (sd1(0, -1) * gr + sd1(0, 1) * gl) * rcp(sd1(0, -1) + sd1(0, 1))

    def _bound_g2(g, n_m, n_p):
        med = _med3(g, n_m, n_p)
        strong = 2.0 * g < rbint
        wt = 2.0 * (rbint - g) * rcp_w(EPS + g + rbint)
        blended = wt * g + (1.0 - wt) * med
        out = jnp.where(g < rbint, jnp.where(strong, med, blended), g)
        return jnp.where(out > clip_pt, _med3(out, n_m, n_p), out)

    gintv = _bound_g2(gintv, s(-1, 0), s(1, 0))
    ginth = _bound_g2(ginth, s(0, -1), s(0, 1))

    g_diag = ginth * (1.0 - hvwt) + gintv * hvwt
    use_diag = (jnp.abs(0.5 - pmwt) >= jnp.abs(0.5 - hvwt)) & m_rb
    if _skip_diag:
        use_diag = use_diag & False
    green = jnp.where(use_diag, g_diag, green)
    dgrb0 = jnp.where(use_diag, green - x, dgrb0)

    # ---- stage 8: chrominance -----------------------------------------------
    # split: dgr valid at R sites, dgb valid at B sites
    dgr = jnp.where(mr, dgrb0, 0.0)
    dgb = jnp.where(mb, dgrb0, 0.0)

    def _propagate_to_opposite(dg, m_src):
        """Interpolate Dgrb from its own coset to the opposite R/B coset."""
        sdg = _Shifter(dg, 5)
        nw = sdg(-1, -1)
        ne = sdg(-1, 1)
        sw = sdg(1, -1)
        se = sdg(1, 1)
        nw3 = sdg(-3, -3)
        ne3 = sdg(-3, 3)
        sw3 = sdg(3, -3)
        se3 = sdg(3, 3)
        wtnw = rcp_w(EPS + jnp.abs(nw - se) + jnp.abs(nw - nw3)
                   + jnp.abs(se - nw3))
        wtne = rcp_w(EPS + jnp.abs(ne - sw) + jnp.abs(ne - ne3)
                   + jnp.abs(sw - ne3))
        wtsw = rcp_w(EPS + jnp.abs(sw - ne) + jnp.abs(sw - se3)
                   + jnp.abs(ne - sw3))
        wtse = rcp_w(EPS + jnp.abs(se - nw) + jnp.abs(se - sw3)
                   + jnp.abs(nw - se3))
        est = (wtnw * (1.325 * nw - 0.175 * nw3 - 0.075 * sdg(-1, -3)
                       - 0.075 * sdg(-3, -1))
               + wtne * (1.325 * ne - 0.175 * ne3 + -0.075 * sdg(-1, 3)
                         - 0.075 * sdg(-3, 1))
               + wtsw * (1.325 * sw - 0.175 * sw3 - 0.075 * sdg(1, -3)
                         - 0.075 * sdg(3, -1))
               + wtse * (1.325 * se - 0.175 * se3 - 0.075 * sdg(1, 3)
                         - 0.075 * sdg(3, 1))) * rcp(wtnw + wtne + wtsw
                                                     + wtse)
        return jnp.where(m_src, dg, jnp.where(m_rb, est, 0.0))

    dgr = _propagate_to_opposite(dgr, mr)
    dgb = _propagate_to_opposite(dgb, mb)

    # at G sites: hvwt-weighted combine of 4 cardinal R/B neighbors
    shw = _Shifter(hvwt, 1)
    sr_ = _Shifter(dgr, 1)
    sb_ = _Shifter(dgb, 1)
    iwsum = rcp(shw(-1, 0) + shw(1, 0) + (1.0 - shw(0, -1))
                + (1.0 - shw(0, 1)))
    dgr_g = (shw(-1, 0) * sr_(-1, 0) + (1.0 - shw(0, 1)) * sr_(0, 1)
             + (1.0 - shw(0, -1)) * sr_(0, -1)
             + shw(1, 0) * sr_(1, 0)) * iwsum
    dgb_g = (shw(-1, 0) * sb_(-1, 0) + (1.0 - shw(0, 1)) * sb_(0, 1)
             + (1.0 - shw(0, -1)) * sb_(0, -1)
             + shw(1, 0) * sb_(1, 0)) * iwsum
    dgr = jnp.where(mg, dgr_g, dgr)
    dgb = jnp.where(mg, dgb_g, dgb)

    red = green - dgr
    blue = green - dgb

    rgb = jnp.stack([red, green, blue]) * 65535.0
    return jnp.maximum(rgb, 0.0)


@register("amaze")
def amaze_demosaic(cfa_in, pattern, init_gain=1.0, _skip_diag=False,
                   _skip_nyq=False, use_pallas=True, **kwargs):
    clip_pt = 1.0 / init_gain
    clip_pt8 = 0.8 / init_gain
    h, w = cfa_in.shape

    # the 3-stage Pallas kernel chain is ~2.6x the whole-plane XLA path on
    # TPU (69ms vs 182ms at 24MP) and avoids its ~9GB of materialized roll
    # planes; the XLA path remains for small images and the _skip_* tests
    if use_pallas and not (_skip_diag or _skip_nyq):
        from art_tpu.demosaic.amaze_pallas import amaze_pallas

        rgb = amaze_pallas(cfa_in, pattern, clip_pt, clip_pt8)
        if rgb is not None:
            return _with_border(cfa_in, pattern, rgb)

    # whole-plane path: pad by HALO so the roll wrap never reaches the
    # interior, compute, crop back
    xp_ = jnp.pad(cfa_in, HALO, mode="reflect") / 65535.0
    mr, mg, mb = bayer_channel_masks(pattern, xp_.shape, xp=jnp)
    rgb = _amaze_core(xp_, mr, mg, mb, clip_pt, clip_pt8,
                      _skip_diag, _skip_nyq)
    rgb = rgb[:, HALO : HALO + h, HALO : HALO + w]
    return _with_border(cfa_in, pattern, rgb)


def _with_border(cfa_in, pattern, rgb):
    """Outer ring falls back to bilinear (reference border interpolation
    is also a simple average fill, amaze_demosaic_RT.cc border block).

    Computed on four thin strips (BORDER + 4 px of context), not the whole
    plane — the whole-plane XLA fallback costs ~30 materialized planes.
    """
    from art_tpu.demosaic.bilinear import bayer_bilinear

    h, w = cfa_in.shape
    m = BORDER + 4  # strip width incl. interpolation context
    strips = {
        "top": (slice(0, m), slice(0, w)),
        "bottom": (slice(h - m, h), slice(0, w)),
        "left": (slice(0, h), slice(0, m)),
        "right": (slice(0, h), slice(w - m, w)),
    }
    # strip origins must be even for Bayer parity; odd-sized images take
    # the whole-plane select instead
    if h % 2 or w % 2:
        fallback = bayer_bilinear(cfa_in, pattern)
        ri = jnp.arange(h)[:, None]
        ci = jnp.arange(w)[None, :]
        ring = ((ri < BORDER) | (ri >= h - BORDER)
                | (ci < BORDER) | (ci >= w - BORDER))
        return jnp.where(ring[None], fallback, rgb)
    out = rgb
    fb_top = bayer_bilinear(cfa_in[strips["top"]], pattern)
    fb_bot = bayer_bilinear(cfa_in[strips["bottom"]], pattern)
    fb_l = bayer_bilinear(cfa_in[strips["left"]], pattern)
    fb_r = bayer_bilinear(cfa_in[strips["right"]], pattern)
    out = out.at[:, :BORDER, :].set(fb_top[:, :BORDER, :])
    out = out.at[:, h - BORDER :, :].set(fb_bot[:, m - BORDER :, :])
    out = out.at[:, :, :BORDER].set(fb_l[:, :, :BORDER])
    out = out.at[:, :, w - BORDER :].set(fb_r[:, :, m - BORDER :])
    return out


def _with_border_rcd(cfa_in, pattern, rgb):
    """Whole-plane RCD ring (kept for reference/testing)."""
    from art_tpu.demosaic.rcd import rcd_demosaic

    h, w = cfa_in.shape
    ri = jnp.arange(h)[:, None]
    ci = jnp.arange(w)[None, :]
    border_mask = ((ri < BORDER) | (ri >= h - BORDER)
                   | (ci < BORDER) | (ci >= w - BORDER))
    fallback = rcd_demosaic(cfa_in, pattern)
    return jnp.where(border_mask[None], fallback, rgb)
