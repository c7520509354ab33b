"""Automatic adjustments (reference: stage_init autos, simpleprocess.cc:224-279).

- auto white balance (RawImageSource::getAutoWBMultipliers — grey-world
  over non-clipped CFA sites);
- auto log encoding (ImProcFunctions::getAutoLog, iplogenc.cc:308 — scene
  dynamic range percentiles on a downsampled develop);
- histogram matching (histmatching.cc:444 — derive a tone curve that maps
  the neutral render to a target look, normally the camera's embedded
  JPEG).

All run on heavily downsampled data at plan time, like the reference.
"""

from __future__ import annotations

import numpy as np

from art_tpu.core.image import bayer_color_index


def auto_wb_multipliers(frame):
    """Grey-world auto WB -> ColorTemp-convention RGB multipliers.

    Reference getAutoWBMultipliers: averages non-clipped sites per channel;
    avg_c are the illuminant estimates, multipliers their reciprocals
    normalized; converted to the RGB multiplier convention via rgb_cam.
    """
    if not frame.is_raw or frame.pattern is None:
        return np.ones(3)
    cfa = np.asarray(frame.cfa, dtype=np.float64)
    h, w = cfa.shape
    cidx = bayer_color_index(frame.pattern, (h, w))
    black = np.asarray(frame.black)
    white = np.asarray(frame.white)
    clip_hi = 0.95 * white.min()
    avgs = []
    for c in range(3):
        sel = (cidx == c) & (cfa < clip_hi)
        vals = cfa[sel] - black[[0, 1, 2][c]]
        avgs.append(max(vals.mean() if vals.size else 1.0, 1e-3))
    # camera-space gains relative to green
    gains = np.array([avgs[1] / avgs[0], 1.0, avgs[1] / avgs[2]])
    # convert to ColorTemp multiplier convention (white color in RGB):
    # gains = pre_mul/(cam_rgb@mult) * norm  =>  mult = rgb_cam@(pre_mul/gains)
    rgb_cam, _, _ = frame.color_matrices()
    pm = frame.pre_mul()
    v = rgb_cam @ (pm[:3] / gains)
    if v[1] <= 0:
        return np.ones(3)
    return np.array([v[0] / v[1], 1.0, v[2] / v[1]])


def auto_log_params(frame, pp):
    """getAutoLog: estimate blackEv/whiteEv/gain from scene statistics."""
    from art_tpu.params.procparams import ProcParams
    from art_tpu.pipeline.develop import develop

    neutral = ProcParams()
    neutral.raw.bayer.method = "fast"
    neutral.icm.working_profile = pp.icm.working_profile
    # small render (the reference uses a 1/10 scale preview)
    sub = _subsample_frame(frame, 8)
    out = develop(sub, neutral)  # encoded sRGB [0,1]
    from art_tpu.color import colorspaces as cs

    lin = cs.srgb_igamma(np.asarray(out), np)
    y = 0.2126 * lin[0] + 0.7152 * lin[1] + 0.0722 * lin[2]
    y = np.maximum(y, 2.0 ** -16)
    lo = np.percentile(y, 1.0)
    hi = np.percentile(y, 99.5)
    med = np.median(y)
    gray = 0.18
    gain = float(np.log2(gray / max(med, 1e-6)))
    black_ev = float(np.log2(max(lo, 1e-6) / gray) - gain)
    white_ev = float(np.log2(max(hi, 1e-6) / gray) - gain + 1.0)
    # keep the reference's slider domains (blackEv < 0 < whiteEv)
    black_ev = float(np.clip(black_ev, -16.0, -0.5))
    white_ev = float(np.clip(white_ev, 0.5, 32.0))
    if white_ev - black_ev < 0.5:
        white_ev = black_ev + 0.5
    return gain, black_ev, white_ev


def _subsample_frame(frame, step):
    """Pattern-preserving CFA subsample (2x2 blocks stride step*2)."""
    import copy

    f = copy.copy(frame)
    if frame.is_raw and frame.pattern is not None:
        c = frame.cfa
        h, w = c.shape
        s = step * 2
        blocks = np.zeros((2 * (h // s), 2 * (w // s)), dtype=c.dtype)
        blocks[0::2, 0::2] = c[0::s, 0::s][: h // s, : w // s]
        blocks[0::2, 1::2] = c[0::s, 1::s][: h // s, : w // s]
        blocks[1::2, 0::2] = c[1::s, 0::s][: h // s, : w // s]
        blocks[1::2, 1::2] = c[1::s, 1::s][: h // s, : w // s]
        f.cfa = blocks
    return f


def histogram_matching_curve(source_rgb01, target_rgb01, n_points=9):
    """Derive a tone curve (sRGB-encoded domain) matching source -> target.

    Reference histmatching.cc matches the neutral raw render against the
    embedded camera JPEG by CDF mapping; returns DiagonalCurve points
    [DCT_SPLINE, x0, y0, ...].
    """
    def lum(img):
        return 0.2126 * img[0] + 0.7152 * img[1] + 0.0722 * img[2]

    s = np.sort(lum(np.asarray(source_rgb01)).ravel())
    t = np.sort(lum(np.asarray(target_rgb01)).ravel())
    qs = np.linspace(0.02, 0.98, n_points)
    xs = np.quantile(s, qs)
    ys = np.quantile(t, qs)
    pts = [1.0, 0.0, 0.0]  # DCT_SPLINE with (0,0) anchor
    lastx = 0.0
    for x, y in zip(xs, ys):
        if x <= lastx + 0.02 or x >= 0.98:
            continue
        pts += [float(x), float(np.clip(y, 0, 1))]
        lastx = x
    pts += [1.0, 1.0]
    return pts


def deconv_auto_radius(frame, lower_limit=1000.0):
    """Estimate the capture's gaussian blur radius from the maximum ratio
    of adjacent diagonal green samples (deconvautoradius.cc
    calcRadiusBayer, Ingo Weyrich's estimator): the sharper the capture,
    the larger a ratio neighboring greens can reach; invert the gaussian
    adjacent-sample falloff to a radius. Returns None when not estimable.
    """
    import numpy as np

    from art_tpu.core.image import bayer_channel_masks

    if frame.pattern is None or frame.cfa is None:
        return None
    cfa = np.asarray(frame.cfa, np.float64)
    black = float(np.asarray(frame.black).mean())
    white = float(np.asarray(frame.white).min())
    x = np.maximum(cfa - black, 0.0)
    clip_val = (white - black) * 0.95
    _, mg, _ = bayer_channel_masks(frame.pattern, cfa.shape, xp=np)

    # clipped-neighborhood exclusion (3x3 dilation of near-clip pixels)
    near_clip = x >= clip_val
    nc = near_clip.copy()
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        nc |= np.roll(near_clip, sh, axis=ax)
    nc |= np.roll(np.roll(near_clip, 1, 0), 1, 1)
    nc |= np.roll(np.roll(near_clip, 1, 0), -1, 1)
    nc |= np.roll(np.roll(near_clip, -1, 0), 1, 1)
    nc |= np.roll(np.roll(near_clip, -1, 0), -1, 1)

    max_ratio = 1.0
    for dx in (-1, 1):
        a = x[:-1, 1:-1]
        b = x[1:, 1 + dx : x.shape[1] - 1 + dx]
        valid = (mg[:-1, 1:-1] & mg[1:, 1 + dx : x.shape[1] - 1 + dx]
                 & ~nc[:-1, 1:-1]
                 & ~nc[1:, 1 + dx : x.shape[1] - 1 + dx])
        hi = np.maximum(a, b)
        lo = np.minimum(a, b)
        valid &= (lo > 0) & (hi > lower_limit)
        if valid.any():
            r = (hi[valid] / lo[valid]).max()
            max_ratio = max(max_ratio, float(r))
    if max_ratio <= 1.0:
        return None
    # gaussian adjacent-sample falloff inversion (deconvautoradius.cc:90)
    radius = float(np.sqrt((1.0 / (np.log(1.0 / max_ratio) / 2.0)) / -2.0))
    if not np.isfinite(radius):
        return None
    return float(np.clip(radius, 0.4, 2.5))
