"""Main denoise (reference: ipdenoise.cc + FTblockDN.cc + nlmeans.cc).

Structure mirrors the reference's `denoise` driver (ipdenoise.cc:1096):
exposure pre-compensation -> RGB_denoise core (gamma-domain wavelet
shrinkage of luminance and chrominance) -> optional guided chroma
smoothing -> optional NLMeans on Y -> exposure restore.

TPU formulation: the reference's overlapped-tile wavelet with per-tile MAD
(Tile_calc, FTblockDN.cc:442) becomes a Pallas à trous wavelet whose
noise sigma is estimated per VMEM tile inside the kernel (bisection
median over the halo window) with energy-adaptive shrinkage; the FFTW
DCT detail pass runs as a matmul-DCT recovery filter (ops.dct_detail). NLMeans follows
nlmeans.cc:50 (patch distances via box sums of squared differences; the
integral-image trick is replaced by cumsum box filters).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import box_blur, gauss_blur, guided_filter
from art_tpu.ops.wavelet import (atrous_decompose, atrous_reconstruct,
                                 mad_sigma, shrink_sure_like)

LEVELS = 5


def plan(pp, ctx):
    dn = pp.denoise
    if not dn.enabled:
        return None
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    # auto chroma (denoiseComputeParams, ipdenoise.cc:800): estimate
    # chrominance + RG/BY offsets from 9 sample-crop noise statistics
    chroma = dn.chrominance
    chroma_rg = dn.chrominance_redgreen
    chroma_by = dn.chrominance_blueyellow
    if dn.chrominance_method != 0:  # auto modes
        est = None
        frame = ctx.get("frame") if hasattr(ctx, "get") else None
        if frame is not None:
            try:
                from art_tpu.pipeline.autos import auto_chroma_params

                est = auto_chroma_params(frame, pp)
            except Exception:
                est = None
        factor = max(dn.chrominance_auto_factor, 0.1)
        if est is not None:
            ch, rg, by = est
            from art_tpu.pipeline.listeners import report_auto

            report_auto("chroma", (float(ch), float(rg), float(by)))
            chroma = ch * factor
            chroma_rg = rg * factor
            chroma_by = by * factor
        else:  # non-Bayer fallback: scaled baseline
            chroma = 15.0 * factor
    from art_tpu.core.curve1d import fit_gamma_split

    gam_fwd, gam_inv = fit_gamma_split(dn.gamma)
    data = {
        "lum_w": lum_w.astype(np.float32),
        "gamma": np.float32(dn.gamma),
        "gam_fwd": gam_fwd,
        "gam_inv": gam_inv,
        "lum_strength": np.float32(dn.luminance / 25.0),
        "lum_detail": np.float32(np.clip(dn.luminance_detail / 100.0, 0, 1)),
        "chroma": np.float32(chroma / 10.0),
        "chroma_rg": np.float32(chroma_rg / 10.0),
        "chroma_by": np.float32(chroma_by / 10.0),
        "ecomp": np.float32(2.0 ** (pp.exposure.expcomp
                                    if pp.exposure.enabled
                                    and pp.exposure.expcomp > 0 else 0.0)),
    }
    nl = 0
    if dn.smoothing_enabled and dn.nl_strength:
        nl = int(dn.nl_strength)
    guided = 0
    if dn.smoothing_enabled and dn.smoothing_method == 1:
        guided = int(dn.guided_chroma_radius)
        data["guided_strength"] = np.float32(dn.guided_chroma_strength / 100.0)
    if nl:
        data["nl_h2"] = np.float32(((nl / 100.0) ** 0.9 / 10.0) ** 2)
        data["nl_detail"] = np.float32(np.clip(dn.nl_detail / 100.0, 0, 0.99))
    # block-DCT detail recovery (FTblockDN.cc:1479) runs when the
    # Luminance Detail slider is engaged; at 0 the pass is a numerical
    # no-op (attenuation factor ~0.007) and is skipped
    use_dct = bool(dn.luminance > 0 and dn.luminance_detail > 0)
    if use_dct:
        data["lum_detail_dct"] = np.float32(dn.luminance_detail)
    return (bool(dn.luminance > 0), nl, guided,
            bool(dn.aggressive), use_dct,
            int(dn.luminance_detail_threshold) if use_dct else 0), data


def _mad_sigma_crop(x):
    """Global MAD sigma (finest à trous detail) on a center crop.

    The estimate is statistical — a 1024px crop tracks the full-plane
    value closely and skips ~12ms of full-plane prelude per image."""
    from art_tpu.ops.wavelet import _sep_blur, _B3

    h, w = x.shape[-2:]
    cs_ = min(1024, h, w)
    y0 = (h - cs_) // 2
    x0 = (w - cs_) // 2
    crop = x[..., y0 : y0 + cs_, x0 : x0 + cs_]
    fine = crop - _sep_blur(crop, _B3, 1)
    return mad_sigma(fine)


def _wavelet_denoise_planes(planes, strengths, blends):
    """Denoise a list of (H, W) planes (one fused Pallas dispatch).

    The Pallas path estimates noise sigma per tile inside the kernel
    (sentinel -1) — the reference's per-tile Mad() statistics
    (FTblockDN.cc:442). The XLA fallback uses a global crop MAD."""
    from art_tpu.ops.wavelet_pallas import wavelet_denoise_pallas_multi

    n = len(planes)
    out = wavelet_denoise_pallas_multi(
        jnp.stack(planes), jnp.full((n,), -1.0, jnp.float32),
        jnp.stack([jnp.asarray(s, jnp.float32) for s in strengths]),
        jnp.stack([jnp.asarray(b, jnp.float32) for b in blends]))
    if out is not None:
        return [out[c] for c in range(n)]

    sigmas = [_mad_sigma_crop(p) for p in planes]
    res = []
    for x, sigma, strength, detail_blend in zip(planes, sigmas, strengths,
                                                blends):
        details, resid = atrous_decompose(x, LEVELS)
        out_details = []
        for lv, d in enumerate(details):
            # noise shrinks by ~2 per coarser à trous level (B3 norm)
            lv_sigma = sigma / (2.0 ** lv)
            dd = shrink_sure_like(d, lv_sigma, strength)
            dd = dd + (d - dd) * detail_blend
            out_details.append(dd)
        res.append(atrous_reconstruct(out_details, resid))
    return res


def _nlmeans(y, h2_base, detail, search_radius=5, patch_radius=2):
    """NLMeans (nlmeans.cc): weights exp(-patchdist * maskinv)."""
    # detail mask: normalized smoothed |laplacian| controls weight scaling
    lap = jnp.abs(y - gauss_blur(y, 2.0))
    lap = gauss_blur(lap, 2.0)
    lap = lap / jnp.maximum(jnp.max(lap), 1e-9)
    mask = lap * (1.0 - detail) + detail
    maskinv = 1.0 / (jnp.maximum(mask, 1e-6) * h2_base)

    # Pallas kernel: the 121-offset accumulation stays in VMEM (~20x less
    # HBM traffic than the whole-plane loop below)
    if search_radius == 5 and patch_radius == 2:
        from art_tpu.ops.nlmeans_pallas import nlmeans_pallas

        out = nlmeans_pallas(y, maskinv)
        if out is not None:
            return out

    patch_n = (2 * patch_radius + 1) ** 2
    acc = jnp.zeros_like(y)
    wsum = jnp.zeros_like(y)
    r = search_radius
    p = jnp.pad(y, r + patch_radius, mode="edge")
    h, w = y.shape
    off = r + patch_radius

    def shifted(dy, dx):
        return p[off + dy : off + dy + h, off + dx : off + dx + w]

    for ty in range(-r, r + 1):
        for tx in range(-r, r + 1):
            diff2 = (y - shifted(ty, tx)) ** 2
            dist2 = box_blur(diff2, patch_radius) * patch_n
            wgt = jnp.exp(-jnp.minimum(dist2 * maskinv, 50.0))
            acc = acc + wgt * shifted(ty, tx)
            wsum = wsum + wgt
    return acc / (wsum + 1e-5)


def apply(rgb, data, static):
    do_lum, nl, guided, aggressive, use_dct, detail_thresh = static
    lw = data["lum_w"]
    ec = data["ecomp"]

    cb = data["chroma"] + data["chroma_by"]
    cr = data["chroma"] + data["chroma_rg"]
    strengths = [data["lum_strength"] if do_lum else 0.0, cb, cr]
    # with the real DCT detail pass engaged, the wavelet runs a pure
    # shrink and the residual detail comes back through the DCT filter
    blends = [data["lum_detail"] if do_lum and not use_dct else 0.0,
              0.0, 0.0]

    # optional fused raw head (develop.py): WB mults + clip + cam2work
    pre = None
    if "pre_mat" in data:
        pre = (data["pre_mults"], data["pre_mat"])

    # fused path: gamma+YUV+wavelet as one Pallas kernel (no guided/
    # NLMeans post passes that need the YUV planes on the outside)
    if nl == 0 and guided == 0 and not use_dct and rgb.ndim == 3:
        from art_tpu.ops.wavelet_pallas import wavelet_denoise_pallas_rgb

        # sigma sentinel -1: per-tile in-kernel MAD (no host prelude)
        out = wavelet_denoise_pallas_rgb(
            rgb, lw, ec, data["gam_fwd"], data["gam_inv"],
            [-1.0, -1.0, -1.0], strengths, blends, pre=pre)
        if out is not None:
            return out

    if pre is not None:
        # kernel unavailable (small image): apply the head chain here
        m = pre[1]
        v = jnp.clip(rgb * pre[0][:, None, None], 0.0, MAXVAL)
        rgb = jnp.stack([
            m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
            m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
            m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
        ])

    x = rgb * ec

    # gamma-domain transform (RGB_denoise dnparams.gamma)
    g = data["gamma"]
    xn = jnp.power(jnp.clip(x / MAXVAL, 0.0, 1.0), 1.0 / g)

    y, u, v = rgb_to_yuv(xn, lw)

    if do_lum:
        y_pre = y
        y, u, v = _wavelet_denoise_planes(
            [y, u, v], [data["lum_strength"], cb, cr], blends)
        if use_dct:
            from art_tpu.ops.dct_detail import dct_detail_recovery

            y = dct_detail_recovery(y_pre, y, data["lum_detail_dct"],
                                    detail_thresh)
    else:
        u, v = _wavelet_denoise_planes([u, v], [cb, cr], [0.0, 0.0])

    if guided > 0:
        gs = data["guided_strength"]
        u2 = guided_filter(y, u, guided, 1e-4)
        v2 = guided_filter(y, v, guided, 1e-4)
        u = u + (u2 - u) * gs
        v = v + (v2 - v) * gs

    if nl:
        y = _nlmeans(y, data["nl_h2"], data["nl_detail"])

    out = yuv_to_rgb(y, u, v, lw)
    out = jnp.power(jnp.clip(out, 0.0, 1.0), g) * MAXVAL
    return out / ec
