"""Raw-domain preprocessing: black subtraction + channel scaling.

Reference: ``RawImageSource::scaleColors`` (rawimagesource.cc:2677-2800) and
``calculate_scale_mul`` (:753-780). The reference's per-pixel FC() branch
becomes a precomputed per-site scale/offset plane broadcast over the mosaic
— one fused multiply-add on device instead of a scalar loop.
"""

from __future__ import annotations

import numpy as np

from art_tpu.core.image import MAXVAL, bayer_color_index, xtrans_color_index


def calculate_scale_mul(pre_mul4, c_white, c_black, is_mono=False):
    """scale_mul[c] = (pre_mul[c]/max(pre_mul)) * 65535/(white[c]-black[c]).

    Returns (scale_mul[4], gain) with gain = max/min ratio (the reference's
    initialGain). Mirrors rawimagesource.cc:753-780.
    """
    pre_mul4 = np.asarray(pre_mul4, dtype=np.float64).copy()
    c_white = np.asarray(c_white, dtype=np.float64)
    c_black = np.asarray(c_black, dtype=np.float64)
    if is_mono:
        scale = MAXVAL / (c_white - c_black)
    else:
        maxpremul = pre_mul4.max()
        scale = (pre_mul4 / maxpremul) * MAXVAL / (c_white - c_black)
    gain = scale.max() / scale.min()
    return scale, gain


def scale_plan(frame, bayer_black_adjust=None, raw_expos=1.0, is_mono=False,
               wb_mults_rgb=None):
    """Host planner for scaleColors: per-c4 offsets/scales -> site planes.

    Returns dict with per-site (H,W) float32 `offset` and `scale` planes,
    plus scalars: scale_mul[4], gain, clmax[3] (post-scale clip levels).
    `bayer_black_adjust` is the user PreBlack0..3 adjustment (G1,R,B,G2
    ordering quirk matches the reference: black_lev[0]=black1 etc.).
    `wb_mults_rgb` is the chosen WB in ColorTemp multiplier convention:
    scaleColors scales by ref_pre_mul = pre_mul / wb (preprocess,
    rawimagesource.cc:1484-1502); None or camera WB means ref_pre_mul =
    pre_mul.
    """
    h, w = frame.cfa.shape
    cblack = np.asarray(frame.black, dtype=np.float64).copy()
    if bayer_black_adjust is not None:
        cblack = np.maximum(cblack + np.asarray(bayer_black_adjust), 0.0)
    c_white = np.asarray(frame.white, dtype=np.float64)
    c_white = (c_white - cblack) / raw_expos + cblack
    pre_mul4 = frame.pre_mul()
    if wb_mults_rgb is not None:
        w4 = np.array([wb_mults_rgb[0], wb_mults_rgb[1], wb_mults_rgb[2],
                       wb_mults_rgb[1]], dtype=np.float64)
        pre_mul4 = pre_mul4 / w4
    scale_mul, gain = calculate_scale_mul(pre_mul4, c_white, cblack, is_mono)
    clmax = (c_white - cblack) * scale_mul

    # The per-site black/scale pattern is periodic (2x2 Bayer / 6x6 X-Trans);
    # ship only the period tile and let the device broadcast it — the full
    # (H,W) planes would add 2x the mosaic's own H2D traffic.
    if frame.pattern is not None:
        cidx = bayer_color_index(frame.pattern, (2, 2))
        c4 = cidx.astype(np.int64).copy()
        # reference: c4 = (c==1 && !(row&1)) ? 3 : c (dcraw 0=R,1=G1,2=B,3=G2)
        g2 = (cidx == 1) & (np.arange(2)[:, None] % 2 == 0)
        c4[g2] = 3
    elif frame.xtrans is not None:
        c4 = xtrans_color_index(frame.xtrans, (6, 6)).astype(np.int64)
    else:
        c4 = np.zeros((1, 1), dtype=np.int64)

    offset_tile = cblack[c4].astype(np.float32)
    scale_tile = scale_mul[c4].astype(np.float32)
    # full-width row patterns: keeps W as the TPU lane dimension when
    # broadcasting (an inner dim of 2 costs ~50ms/24MP in lane waste)
    from art_tpu.settings import settings

    wpad = -(-w // settings.pad_multiple) * settings.pad_multiple
    th, tw = offset_tile.shape
    reps = -(-wpad // tw)
    offset_rows = np.tile(offset_tile, (1, reps))[:, :wpad]
    scale_rows = np.tile(scale_tile, (1, reps))[:, :wpad]
    # pad the row period up to a multiple of the f32 sublane count (8): the
    # device reshape (H,W)->(H/th,th,W) is then a pure bitcast (rows group
    # exactly into sublane tiles) instead of a 4x-padded relayout
    vreps = int(np.lcm(th, 8)) // th
    offset_rows = np.tile(offset_rows, (vreps, 1))
    scale_rows = np.tile(scale_rows, (vreps, 1))
    return {
        "offset_tile": offset_rows,
        "scale_tile": scale_rows,
        "scale_mul": scale_mul,
        "gain": gain,
        "clmax": clmax[:3],
        "cblack": cblack,
        "c_white": c_white,
    }


def scale_plan_foveon(frame, raw_expos=1.0, wb_mults_rgb=None):
    """scaleColors for 3-plane Foveon frames (the reference includes
    ST_FOVEON in the Bayer-style scaling path, rawimagesource.cc:2687):
    per-channel (black, scale) broadcast over the (3, H, W) stack."""
    cblack = np.asarray(frame.black, dtype=np.float64).copy()
    c_white = np.asarray(frame.white, dtype=np.float64)
    c_white = (c_white - cblack) / raw_expos + cblack
    pre_mul4 = frame.pre_mul()
    if wb_mults_rgb is not None:
        w4 = np.array([wb_mults_rgb[0], wb_mults_rgb[1], wb_mults_rgb[2],
                       wb_mults_rgb[1]], dtype=np.float64)
        pre_mul4 = pre_mul4 / w4
    scale_mul, gain = calculate_scale_mul(pre_mul4, c_white, cblack)
    clmax = (c_white - cblack) * scale_mul
    return {
        "offset3": cblack[:3].astype(np.float32).reshape(3, 1, 1),
        "scale3": scale_mul[:3].astype(np.float32).reshape(3, 1, 1),
        "scale_mul": scale_mul,
        "gain": gain,
        "clmax": clmax[:3],
        "cblack": cblack,
        "c_white": c_white,
    }


def apply_scale(cfa, offset_tile, scale_tile, xp):
    """Device-side: (raw - black) * scale with the periodic level pattern
    broadcast over the mosaic (scaleColors inner loop).

    NOTE: jnp.tile of a small pattern to 24MP hit a ~54ms lowering on v5e,
    and the (H,W)->(H/p,p,W) reshape trick leaves a sublane-2 layout that
    quadruples effective HBM traffic (~3.7ms measured). Row-parity selects
    over the native (H, W) layout stay fully fused and bandwidth-bound:
    the period is tiny (2 for Bayer, 6 for X-Trans), so p masked selects
    of (W,) rows beat any relayout.
    """
    h, w = cfa.shape
    th = offset_tile.shape[0]  # tiles are (period, W) row patterns
    if xp is not np and th <= 8:
        import jax

        rp = jax.lax.broadcasted_iota(xp.int32, (h, w), 0) % th
        offset = offset_tile[0][None, :]
        scale = scale_tile[0][None, :]
        for k in range(1, th):
            sel = rp == k
            offset = xp.where(sel, offset_tile[k][None, :], offset)
            scale = xp.where(sel, scale_tile[k][None, :], scale)
        return xp.maximum(cfa - offset, 0.0) * scale
    # host/numpy fallback: explicit row indexing
    rows = xp.arange(h) % th
    offset = offset_tile[rows]
    scale = scale_tile[rows]
    return xp.maximum(cfa - offset, 0.0) * scale
