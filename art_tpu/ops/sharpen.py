"""Sharpening: USM + Richardson-Lucy deconvolution (reference: ipsharpen.cc).

Works on the working-image luminance with the contrast blend mask
(rt_algo.cc buildBlendMask: sigmoid of the 4-direction gradient norm vs the
contrast threshold). Methods:
- "rld": RL deconvolution — iterate I_{k+1} = I_k * G(L / G(I_k)), 20
  iterations with the reference's per-pixel divergence stop folded into a
  running freeze mask; corner boost runs a second sigma and blends by a
  radial mask.
- "usm": gamma-3 domain unsharp mask with the 4-point threshold ramp and
  optional halo control.
- "psf": RL deconvolution with a measured PSF kernel loaded from a JSON
  (flat n^2 or matrix) or image file (ipsharpen.cc:347 import_kernel,
  :523 rl_deconvolution_psf); the two convolutions per iteration (kernel
  + flipped kernel) run as XLA ``conv_general_dilated`` and the log-domain
  divergence stop (delta 0.3) freezes pixels like the "rld" path.
Also used for post-resize sharpening (OutputSharpening group).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import gauss_blur


def _plan(sp, ctx, lum_w):
    if not sp.enabled:
        return None
    data = {
        "lum_w": lum_w.astype(np.float32),
        "amount": np.float32(sp.deconv_amount / 100.0
                             if sp.method == "rld" else sp.amount / 100.0),
        "contrast": np.float32(max(sp.contrast, 0.0) / 100.0),
        "thresh": np.array(list(sp.threshold) + [20, 80, 2000, 1200])[:4]
        .astype(np.float32),
    }
    if sp.method == "rld":
        radius = float(max(sp.deconv_radius, 0.2))
        if getattr(sp, "deconv_auto_radius", False):
            # RawImageSource::getDeconvAutoRadius (deconvautoradius.cc)
            from art_tpu.pipeline.autos import deconv_auto_radius

            frame = ctx.get("frame")
            est = deconv_auto_radius(frame) if frame is not None else None
            if est is not None:
                radius = est
                from art_tpu.pipeline.listeners import report_auto

                report_auto("deconv_radius", float(est))
        static = ("rld", radius, 20)
    elif sp.method == "psf":
        kern = load_psf_kernel(sp.psf_kernel,
                               scale=float(ctx.get("scale", 1.0) or 1.0))
        if kern is None:
            return None  # unreadable/invalid kernel: op skipped (ref errors)
        data["psf"] = kern
        data["amount"] = np.float32(1.0)  # psf path has no amount slider
        static = ("psf", int(kern.shape[0]), int(max(sp.psf_iterations, 1)))
    else:
        static = ("usm", float(max(sp.radius, 0.2)), 0)
    return static, data


def load_psf_kernel(path, scale=1.0):
    """Load + normalize a PSF kernel (import_kernel/rescale_kernel,
    ipsharpen.cc:347-495): JSON flat n^2 list or matrix, or a square
    odd-sized image (green channel). Returns (k, k) float32 or None."""
    import json
    import os

    if not path or not os.path.exists(path):
        return None
    k = None
    try:
        with open(path, "rb") as f:
            head = f.read(32)
        if head.lstrip()[:1] == b"[":
            obj = json.load(open(path))
            arr = np.asarray(obj, np.float32)
            if arr.ndim == 1:
                n = int(round(arr.size ** 0.5))
                if n * n != arr.size or n < 2:
                    return None
                k = arr.reshape(n, n)
            elif arr.ndim == 2 and arr.shape[0] == arr.shape[1]:
                k = arr
        else:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"), np.float32)
            if img.shape[0] == img.shape[1] and img.shape[0] % 2 == 1:
                k = img[:, :, 1]
    except Exception:
        return None
    if k is None or k.shape[0] % 2 == 0:
        return None
    # rescale to the processing scale (fast-export subsampling)
    kw = int(k.shape[0] / scale) | 1
    if kw < 3:
        return None
    if kw != k.shape[0]:
        sh = k.shape[0] // 2
        h = kw // 2
        s = k.shape[0] / kw
        yy, xx = np.mgrid[-h : h + 1, -h : h + 1].astype(np.float32) * s
        # symmetric bilinear sample (rescale_kernel's mirrored get())
        def samp(y, x):
            ya, xa = np.abs(y), np.abs(x)
            yi, xi = ya.astype(int), xa.astype(int)
            yf, xf = ya - yi, xa - xi
            yi1 = np.minimum(yi + 1, sh)
            xi1 = np.minimum(xi + 1, sh)
            yi, yi1 = np.where(y < 0, -yi, yi), np.where(y < 0, -yi1, yi1)
            xi, xi1 = np.where(x < 0, -xi, xi), np.where(x < 0, -xi1, xi1)
            bl = k[yi + sh, xi + sh]
            br = k[yi + sh, xi1 + sh]
            tl = k[yi1 + sh, xi + sh]
            tr = k[yi1 + sh, xi1 + sh]
            return (1 - yf) * ((1 - xf) * bl + xf * br) \
                + yf * ((1 - xf) * tl + xf * tr)

        k = samp(yy, xx)
    s = float(k.sum())
    if s >= 1e-5:
        k = k / s
    else:
        k = np.zeros_like(k)
        k[k.shape[0] // 2, k.shape[1] // 2] = 1.0
    return k.astype(np.float32)


def plan(pp, ctx):
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    return _plan(pp.sharpening, ctx, lum_w)


def _blend_mask(y, contrast_thresh, amount):
    """buildBlendMask (rt_algo.cc:315-455), fixed-threshold path.

    y in the reference's 0..65535 luminance domain.
    """
    p = jnp.pad(y, 2, mode="edge")
    h, w = y.shape

    def sh(dy, dx):
        return p[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]

    # reference scale is for Lab L in 0..32768; our Y is 0..65535
    scale = 0.0625 / 655.36
    contrast = jnp.sqrt(
        (sh(0, 1) - sh(0, -1)) ** 2 + (sh(1, 0) - sh(-1, 0)) ** 2
        + (sh(0, 2) - sh(0, -2)) ** 2 + (sh(2, 0) - sh(-2, 0)) ** 2
    ) * scale
    t = jnp.maximum(contrast_thresh, 1e-5)
    blend = amount / (1.0 + jnp.exp(
        jnp.clip(16.0 - 16.0 * contrast / t, -40.0, 40.0)))
    return jnp.where(contrast_thresh > 0, blend, amount)


def _threshold_ramp(x, t):
    """Threshold<int>::multiply quad ramp (procparams.h:446-497):
    0 below t[0], ramp to 1 across [t0,t1], 1 to t[3], ramp down to t[2]."""
    bl, tl, br, tr = t[0], t[1], t[2], t[3]
    up = jnp.clip((x - bl) / jnp.maximum(tl - bl, 1e-5), 0.0, 1.0)
    down = 1.0 - jnp.clip((x - tr) / jnp.maximum(br - tr, 1e-5), 0.0, 1.0)
    return up * down


def _rl_deconv(y, blend, sigma, iterations, amount):
    """deconvsharpening (ipsharpen.cc:144-228)."""
    offset = 1000.0
    lum = y + offset
    est = jnp.maximum(lum, 0.0)
    frozen = jnp.zeros_like(y, dtype=bool)
    out = lum
    delta_factor = 0.2
    for _ in range(iterations):
        div = lum / jnp.maximum(gauss_blur(est, sigma), 1e-6)
        est_new = est * gauss_blur(div, sigma)
        diverged = jnp.abs(est_new - lum) > lum * delta_factor
        newly = diverged & ~frozen
        out = jnp.where(newly, est_new, out)
        frozen = frozen | diverged
        est = est_new
    final = jnp.where(frozen, out, est)
    b = blend * amount
    result = b * jnp.maximum(final, 0.0) + (1.0 - b) * lum
    return jnp.maximum(result - offset, 0.0)


def _conv2(x, k):
    """2-D conv with edge-replicated borders (Convolution class role)."""
    import jax

    r = k.shape[0] // 2
    xp = jnp.pad(x, r, mode="edge")
    return jax.lax.conv_general_dilated(
        xp[None, None], k[None, None], (1, 1), "VALID")[0, 0]


def _rl_deconv_psf(y, blend, kern, iterations):
    """rl_deconvolution_psf (ipsharpen.cc:523): RL with a measured PSF.

    Per-pixel stop: once |log(est) - log(lum)| exceeds 0.3 the pixel's
    output is captured and frozen (the reference writes `out` once and
    skips it afterwards)."""
    kflip = kern[::-1, ::-1]  # equals kern for symmetric PSFs
    lum = jnp.maximum(y, 0.0)
    est = lum
    frozen = jnp.zeros_like(y, dtype=bool)
    captured = lum
    delta = 0.3
    for _ in range(iterations):
        tmp = _conv2(est, kern)
        tmp = jnp.where(tmp > 1e-5, lum / jnp.maximum(tmp, 1e-5), tmp)
        tmp = _conv2(tmp, kflip)
        est = est * tmp
        diverged = jnp.abs(jnp.log(jnp.maximum(est, 1e-5)
                                   / jnp.maximum(lum, 1e-5))) > delta
        newly = diverged & ~frozen
        val = blend * jnp.maximum(est, 0.0) + (1.0 - blend) * lum
        captured = jnp.where(newly, val, captured)
        frozen = frozen | diverged
    final = blend * jnp.maximum(est, 0.0) + (1.0 - blend) * lum
    return jnp.where(frozen, captured, final)


def _usm(y, blend, radius, amount, thresh):
    # gamma-3 domain (ipsharpen.cc apply_gamma)
    yn = jnp.power(jnp.clip(y / MAXVAL, 0.0, 1.0), 1.0 / 3.0) * MAXVAL
    b2 = gauss_blur(yn, radius)
    diff = yn - b2
    delta = _threshold_ramp(jnp.minimum(jnp.abs(diff), 2000.0), thresh) * (
        amount * diff)
    out = blend * (yn + delta) + (1.0 - blend) * yn
    return jnp.power(jnp.clip(out / MAXVAL, 0.0, 1.0), 3.0) * MAXVAL


def apply(rgb, data, static):
    method, radius, iters = static
    lw = data["lum_w"]
    y, u, v = rgb_to_yuv(rgb, lw)
    blend = _blend_mask(y, data["contrast"], 1.0)
    if method == "rld":
        y2 = _rl_deconv(y, blend, radius, iters, data["amount"])
    elif method == "psf":
        y2 = _rl_deconv_psf(y, blend, data["psf"], iters)
    else:
        y2 = _usm(y, blend, radius, data["amount"], data["thresh"])
    f = jnp.where(y > 1e-5, y2 / jnp.maximum(y, 1e-5), 1.0)
    return yuv_to_rgb(y2, u * f, v * f, lw)


def plan_pr(pp, ctx):
    """Post-resize sharpening (OutputSharpening group)."""
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    return _plan(pp.pr_sharpening, ctx, lum_w)
