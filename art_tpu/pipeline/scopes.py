"""Histogram / waveform / vectorscope data (reference:
improccoordinator.cc updateLRGBHistograms/updateVectorscope/
updateWaveforms :560-660, listener surface rtengine.h:272-330).

The reference computes these on the preview image for the GUI panels;
here they are a headless API over any (3, H, W) image so embedders get
the same observability. Host-side numpy — scope inputs are preview-sized
and histogram scatter-adds are hostile to the TPU vector unit.
"""

from __future__ import annotations

import numpy as np

from art_tpu.core.image import MAXVAL


def histogram_rgbl(rgb, bins=256):
    """Per-channel + luminance histograms.

    rgb: (3, H, W), 0..MAXVAL domain. Returns dict of (bins,) int64
    arrays: r, g, b, l (Rec709 luma, as the reference's luminance
    histogram uses the working-space Y)."""
    x = np.asarray(rgb)
    out = {}
    edges = np.linspace(0.0, MAXVAL, bins + 1)
    for name, plane in (("r", x[0]), ("g", x[1]), ("b", x[2])):
        out[name], _ = np.histogram(plane, bins=edges)
    luma = 0.2126 * x[0] + 0.7152 * x[1] + 0.0722 * x[2]
    out["l"], _ = np.histogram(luma, bins=edges)
    return out


def waveform(rgb, bins=256, max_cols=512):
    """Per-column intensity distribution: (3, bins, n_cols) counts
    (the reference's waveform panel; columns subsampled to max_cols)."""
    x = np.asarray(rgb)
    _, h, w = x.shape
    step = max(w // max_cols, 1)
    cols = x[:, :, ::step]
    n_cols = cols.shape[2]
    q = np.clip((cols / MAXVAL * (bins - 1)).astype(np.int64), 0, bins - 1)
    out = np.zeros((3, bins, n_cols), dtype=np.int64)
    col_idx = np.broadcast_to(np.arange(n_cols)[None, :], q.shape[1:])
    for c in range(3):
        np.add.at(out[c], (q[c].ravel(), col_idx.ravel()), 1)
    return out


def vectorscope(rgb, size=128):
    """CbCr chromaticity density grid (size, size) counts (the
    reference's vectorscope, YCbCr as in its HSV/Lab scope modes)."""
    x = np.asarray(rgb) / MAXVAL
    y = 0.2126 * x[0] + 0.7152 * x[1] + 0.0722 * x[2]
    cb = (x[2] - y) * 0.5389
    cr = (x[0] - y) * 0.6350
    qi = np.clip(((cr + 0.5) * (size - 1)).astype(np.int64), 0, size - 1)
    qj = np.clip(((cb + 0.5) * (size - 1)).astype(np.int64), 0, size - 1)
    out = np.zeros((size, size), dtype=np.int64)
    np.add.at(out, (qi.ravel(), qj.ravel()), 1)
    return out


def raw_histogram(cfa, pattern, bins=256, black=0.0, white=65535.0):
    """Per-CFA-channel raw histograms (RawImageSource::getRAWHistogram)."""
    from art_tpu.core.image import bayer_channel_masks

    x = np.asarray(cfa)
    edges = np.linspace(float(black), float(white), bins + 1)
    out = {}
    if pattern is None:
        out["g"], _ = np.histogram(x, bins=edges)
        return out
    mr, mg, mb = bayer_channel_masks(pattern, x.shape, xp=np)
    for name, m in (("r", mr), ("g", mg), ("b", mb)):
        out[name], _ = np.histogram(x[np.asarray(m)], bins=edges)
    return out
