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
        static = ("rld", radius, 20)
    else:
        static = ("usm", float(max(sp.radius, 0.2)), 0)
    return static, data


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
    else:
        y2 = _usm(y, blend, radius, data["amount"], data["thresh"])
    f = jnp.where(y > 1e-5, y2 / jnp.maximum(y, 1e-5), 1.0)
    return yuv_to_rgb(y2, u * f, v * f, lw)


def plan_pr(pp, ctx):
    """Post-resize sharpening (OutputSharpening group)."""
    lum_w = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]][1]
    return _plan(pp.pr_sharpening, ctx, lum_w)
